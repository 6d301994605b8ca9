"""Torch checkpoint interchange (VERDICT r3 missing #1 / next #3).

Golden-tests the importer against synthetic torch checkpoints shaped
EXACTLY like the reference's save_mapper/save_learned_embeds output
(reference checkpoint_handler.py:40-97): pickled encoder module and all.
Proves (a) the state_dict rename produces a Flax mapper whose forward
matches an independent torch forward of the reference math, and (b) a
mode-5 Coach consumes a raw .pt path bit-exactly via the auto-import.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from view_neti_tpu import config as config_lib  # noqa: E402
from view_neti_tpu.config import RunConfig, decode  # noqa: E402
from view_neti_tpu.models.neti_mapper import NeTIMapper  # noqa: E402
from view_neti_tpu.torch_interop import (  # noqa: E402
    _install_unpickle_shims, convert_learned_embeds,
    convert_mapper_checkpoint, flax_from_torch_state,
    import_torch_artifacts)
from view_neti_tpu.utils.types import PESigmas  # noqa: E402

pytestmark = pytest.mark.quick

PE_DIM = 64
WORD_DIM = 32


def _shim_encoder(nfeats, sigmas, seed=0):
    """An instance of the shim FourierPositionalEncodingNDims carrying a
    reference-construction w (positional_encoding.py:164-171)."""
    _install_unpickle_shims()
    import models.positional_encoding as ref_pe
    enc = ref_pe.FourierPositionalEncodingNDims()
    torch.manual_seed(seed)
    w = torch.randn(PE_DIM // 2, nfeats)
    for i, s in enumerate(sigmas):
        w[:, i] *= s
    enc.w = torch.nn.Parameter(w)
    return enc


class _TorchRefMapper(torch.nn.Module):
    """Structural mirror of the reference arch-15 mapper: submodule names
    (encoder/net/output_layer) produce the exact reference state_dict
    keys (reference neti_mapper.py:513-518, 601-608)."""

    def __init__(self, nfeats, out_dim, h=64, seed=0, sigmas=None):
        super().__init__()
        self.encoder = _shim_encoder(nfeats, sigmas or [1.0] * nfeats,
                                     seed=seed)
        torch.manual_seed(seed + 1)
        self.net = torch.nn.Sequential(
            torch.nn.Linear(PE_DIM, h), torch.nn.LayerNorm(h),
            torch.nn.LeakyReLU(), torch.nn.Linear(h, h),
            torch.nn.LayerNorm(h), torch.nn.LeakyReLU())
        self.output_layer = torch.nn.Sequential(torch.nn.Linear(h, out_dim))

    def forward(self, t, l, cam=None):
        """The reference forward math (neti_mapper.py:542-547, 376-434)."""
        x = torch.stack([t / 1000.0 * 2 - 1, l / 16.0 * 2 - 1], dim=-1)
        if cam is not None:
            x = torch.cat([x, cam], dim=-1)
        proj = x @ self.encoder.w.T
        enc = torch.cat([proj.sin(), proj.cos()], dim=-1)
        out = self.output_layer(self.net(enc))
        return out.chunk(2, dim=-1)


def _ref_cfg_dict(**model_overrides):
    """A reference-shaped encoded cfg, including the runtime-poisoned keys
    clean_config_dict must strip (reference checkpoint_handler.py:99-127)."""
    model = {"arch_view_net": 15, "arch_view_disable_tl": False,
             "word_embedding_dim": WORD_DIM,
             "normalize_view_mapper_output": False}
    model.update(model_overrides)
    cfg = decode(RunConfig, {
        "learnable_mode": 2,
        "model": model,
        "data": {"camera_representation": "dtu-12d", "dtu_subset": 6}})
    enc = config_lib.encode(cfg)
    enc["data"]["placeholder_view_tokens"] = ["<view_x>"]
    enc["model"]["target_norm_view"] = None
    enc["model"]["pretrained_view_mapper"] = None
    return enc


def _save_ref_view_ckpt(path, mirror):
    """Shape exactly as reference save_mapper's view branch
    (checkpoint_handler.py:80-97): pickled encoder module included."""
    torch.save({
        "cfg": _ref_cfg_dict(),
        "mappers": {"dummy_key": {
            "state_dict": mirror.state_dict(),
            "encoder": mirror.encoder,
            "placeholder_object_token": "dummy"}},
    }, str(path))


class TestStateDictConversion:
    def test_arch15_view_forward_matches_torch(self):
        sigmas = [0.03, 2.0] + [0.5] * 12
        mirror = _TorchRefMapper(14, WORD_DIM * 2, seed=3, sigmas=sigmas)
        params, constants = flax_from_torch_state(mirror.state_dict())
        assert "fourier_w" in constants

        m = NeTIMapper(embedding_type="view", output_dim=WORD_DIM,
                       arch_view_net=15, arch_view_disable_tl=False,
                       use_nested_dropout=False, num_view_cond_dims=12,
                       pe_sigmas=PESigmas(sigma_t=0.03, sigma_l=2.0,
                                          sigma_dtu12=0.5))
        t = np.array([0.0, 500.0, 999.0], np.float32)
        l = np.array([0.0, 7.0, 15.0], np.float32)
        cam = np.random.RandomState(0).uniform(
            -1, 1, (3, 12)).astype(np.float32)
        out = m.apply({"params": params, "constants": constants},
                      jnp.asarray(t), jnp.asarray(l),
                      view_params=jnp.asarray(cam))
        with torch.no_grad():
            word_t, bypass_t = mirror(torch.tensor(t), torch.tensor(l),
                                      torch.tensor(cam))
        np.testing.assert_allclose(np.asarray(out.word_embedding),
                                   word_t.numpy(), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out.bypass_output),
                                   bypass_t.numpy(), rtol=1e-5, atol=1e-5)

    def test_arch15_object_forward_matches_torch(self):
        mirror = _TorchRefMapper(2, WORD_DIM * 2, h=128, seed=5,
                                 sigmas=[0.03, 2.0])
        params, constants = flax_from_torch_state(mirror.state_dict())
        m = NeTIMapper(embedding_type="object", output_dim=WORD_DIM,
                       arch_view_net=15, arch_mlp_hidden_dims=128,
                       use_nested_dropout=False,
                       pe_sigmas=PESigmas(sigma_t=0.03, sigma_l=2.0))
        t = np.array([100.0, 900.0], np.float32)
        l = np.array([1.0, 14.0], np.float32)
        out = m.apply({"params": params, "constants": constants},
                      jnp.asarray(t), jnp.asarray(l))
        with torch.no_grad():
            word_t, bypass_t = mirror(torch.tensor(t), torch.tensor(l))
        np.testing.assert_allclose(np.asarray(out.word_embedding),
                                   word_t.numpy(), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out.bypass_output),
                                   bypass_t.numpy(), rtol=1e-5, atol=1e-5)

    def test_original_ti_state(self):
        sd = {"ti_embeddings": torch.randn(4, WORD_DIM)}
        params, constants = flax_from_torch_state(sd)
        assert params["ti_embeddings"].shape == (4, WORD_DIM)
        assert constants == {}

    def test_legacy_pe1_object_keys(self):
        """Legacy PE-1 object mapper: NeTI anchor encoder + input layer
        (reference neti_mapper.py:96-108, 155-163)."""
        torch.manual_seed(0)
        sd = {
            "encoder.w": torch.randn(1024, 2),
            "input_layer.weight": torch.randn(160, 2048),
            "input_layer.bias": torch.randn(160),
            "net.0.weight": torch.randn(128, 160),
            "net.0.bias": torch.randn(128),
            "net.1.weight": torch.randn(128),
            "net.1.bias": torch.randn(128),
            "net.3.weight": torch.randn(128, 128),
            "net.3.bias": torch.randn(128),
            "net.4.weight": torch.randn(128),
            "net.4.bias": torch.randn(128),
            "output_layer.0.weight": torch.randn(WORD_DIM * 2, 128),
            "output_layer.0.bias": torch.randn(WORD_DIM * 2),
        }
        params, constants = flax_from_torch_state(sd)
        assert constants["neti_w"].shape == (1024, 2)
        assert params["input_layer"]["kernel"].shape == (2048, 160)
        assert params["net_dense0"]["kernel"].shape == (160, 128)
        # forward works through our legacy mapper path
        m = NeTIMapper(embedding_type="object", output_dim=WORD_DIM,
                       arch_view_net=0, use_positional_encoding=1,
                       arch_mlp_hidden_dims=128, use_nested_dropout=False,
                       pe_sigmas=PESigmas(sigma_t=0.03, sigma_l=2.0))
        out = m.apply({"params": params, "constants": constants},
                      jnp.asarray([500.0]), jnp.asarray([8.0]))
        assert np.isfinite(np.asarray(out.word_embedding)).all()


class TestCheckpointImport:
    def test_view_ckpt_roundtrip(self, tmp_path):
        from view_neti_tpu.checkpoint import CheckpointHandler
        mirror = _TorchRefMapper(14, WORD_DIM * 2, seed=7,
                                 sigmas=[0.03, 2.0] + [0.5] * 12)
        pt = tmp_path / "mapper-steps-500_view.pt"
        _save_ref_view_ckpt(pt, mirror)

        written = import_torch_artifacts(tmp_path / "out", view_path=pt)
        assert written[0].name == "mapper-steps-500_view.msgpack"
        cfg, payload = CheckpointHandler.load_mapper(written[0])
        assert cfg.model.arch_view_net == 15
        entry = payload["mappers"]["view"]
        np.testing.assert_array_equal(
            entry["constants"]["fourier_w"],
            mirror.encoder.w.detach().numpy())
        np.testing.assert_array_equal(
            entry["params"]["net_dense0"]["kernel"],
            mirror.net[0].weight.detach().numpy().T)

    def test_object_ckpt_keyed_by_token(self, tmp_path):
        mirrors = {101: ("<skull>", _TorchRefMapper(2, WORD_DIM * 2,
                                                    h=128, seed=1,
                                                    sigmas=[0.03, 2.0])),
                   102: ("<house>", _TorchRefMapper(2, WORD_DIM * 2,
                                                    h=128, seed=2,
                                                    sigmas=[0.03, 2.0]))}
        pt = tmp_path / "mapper-steps-900_object.pt"
        torch.save({
            "cfg": _ref_cfg_dict(),
            "mappers": {tid: {"state_dict": m.state_dict(),
                              "encoder": m.encoder,
                              "placeholder_object_token": tok}
                        for tid, (tok, m) in mirrors.items()},
        }, str(pt))
        payload = convert_mapper_checkpoint(pt, "object")
        assert set(payload["mappers"]) == {"<skull>", "<house>"}
        np.testing.assert_array_equal(
            payload["mappers"]["<house>"]["params"]["output_layer"]["bias"],
            mirrors[102][1].output_layer[0].bias.detach().numpy())

    def test_learned_embeds_bin(self, tmp_path):
        rows = {"<view_x>": torch.randn(WORD_DIM),
                "<skull>": torch.randn(WORD_DIM)}
        p = tmp_path / "learned_embeds-steps-500.bin"
        torch.save(rows, str(p))
        out = convert_learned_embeds(p)
        assert set(out) == set(rows)
        np.testing.assert_allclose(out["<skull>"],
                                   rows["<skull>"].numpy(), rtol=1e-6)


class TestMode5Consumption:
    def test_coach_ingests_raw_pt_bit_exact(self, tmp_path):
        """A mode-5 Coach pointed at the torch .pt directly must load the
        converted params/constants bit-exactly (the auto-import path)."""
        from PIL import Image
        from view_neti_tpu.training import builder, inference_dtu
        from view_neti_tpu.training.coach import Coach

        rng = np.random.RandomState(0)
        cal = tmp_path / "Calibration" / "cal18"
        cal.mkdir(parents=True)
        for i in range(1, 65):
            m = rng.randn(3, 4) * 100
            (cal / f"pos_{i:03d}.txt").write_text(
                "\n".join(" ".join(f"{x:.4f}" for x in r) for r in m))
        scan = tmp_path / "Rectified" / "scan114"
        scan.mkdir(parents=True)
        cam_idxs, cam_idxs_train, _ = inference_dtu.get_cam_idxs(6)
        for i in sorted(set(cam_idxs) | set(cam_idxs_train)):
            Image.fromarray(rng.randint(0, 255, (48, 64, 3), np.uint8)
                            ).save(scan / f"rect_{i + 1:03d}_3_r5000.png")

        mirror = _TorchRefMapper(14, WORD_DIM * 2, seed=11,
                                 sigmas=[0.03, 2.0] + [0.5] * 12)
        pt = tmp_path / "mapper-steps-50000_view.pt"
        _save_ref_view_ckpt(pt, mirror)

        cfg = decode(RunConfig, {
            "learnable_mode": 5,
            "data": {"train_data_dir": str(scan),
                     "camera_representation": "dtu-12d",
                     "dtu_subset": 6, "dtu_preprocess_key": -1,
                     "repeats": 2, "resolution": 16,
                     "placeholder_object_token": "<skull>"},
            "model": {"arch_view_net": 15, "word_embedding_dim": WORD_DIM,
                      "arch_view_disable_tl": False,
                      "pretrained_view_mapper": str(pt)},
            "log": {"exp_dir": str(tmp_path / "exp"),
                    "save_dataset_images": False},
            "optim": {"max_train_steps": 1, "train_batch_size": 2,
                      "gradient_accumulation_steps": 1}})
        coach = Coach(cfg, arch=builder.tiny_arch(),
                      calibration_dir=str(cal))
        expect_params, expect_consts = flax_from_torch_state(
            mirror.state_dict())
        got = jax.device_get(coach.built.trainable["view"])
        for name in ("net_dense0", "net_ln0", "net_dense1", "net_ln1",
                     "output_layer"):
            for leaf in got[name]:
                np.testing.assert_array_equal(
                    got[name][leaf], expect_params[name][leaf])
        np.testing.assert_array_equal(
            jax.device_get(
                coach.built.frozen.text.view_constants["fourier_w"]),
            expect_consts["fourier_w"])
        # the cached msgpack sits next to the .pt for future runs
        assert pt.with_suffix(".msgpack").exists()

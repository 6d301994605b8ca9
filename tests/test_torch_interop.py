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
    _REF_CFG_FIELDS, _REF_CFG_TOP, _install_unpickle_shims,
    convert_learned_embeds, convert_mapper_checkpoint,
    export_torch_artifacts, flax_from_torch_state, import_torch_artifacts,
    load_torch_checkpoint)
from view_neti_tpu.utils.types import PESigmas  # noqa: E402

pytestmark = pytest.mark.quick

PE_DIM = 64
WORD_DIM = 32


def _shim_encoder(nfeats, sigmas, seed=0, registered=False):
    """An instance of the shim FourierPositionalEncodingNDims carrying a
    reference-construction w (positional_encoding.py:164-171).

    By default ``w`` is a PLAIN tensor attribute — the state a CUDA-saved
    reference checkpoint carries, because ``nn.Parameter(...).cuda()``
    (positional_encoding.py:171) returns a plain Tensor, demoting ``w``
    out of the module's registered parameters. ``registered=True`` models
    a CPU-saved checkpoint where ``w`` stays a Parameter (and so appears
    in the state_dict as ``encoder.w``).
    """
    _install_unpickle_shims()
    import models.positional_encoding as ref_pe
    enc = ref_pe.FourierPositionalEncodingNDims()
    torch.manual_seed(seed)
    w = torch.randn(PE_DIM // 2, nfeats)
    for i, s in enumerate(sigmas):
        w[:, i] *= s
    enc.sigmas = list(sigmas)
    enc.dim = PE_DIM
    enc.normalize = False
    enc.w = torch.nn.Parameter(w) if registered \
        else torch.nn.Parameter(w).to("cpu", copy=True)
    assert registered == ("w" in dict(enc.named_parameters()))
    return enc


class _TorchRefMapper(torch.nn.Module):
    """Structural mirror of the reference arch-15 mapper: submodule names
    (encoder/net/output_layer) produce the exact reference state_dict
    keys (reference neti_mapper.py:513-518, 601-608) — which on the
    CUDA-trained published artifacts do NOT include ``encoder.w``."""

    def __init__(self, nfeats, out_dim, h=64, seed=0, sigmas=None,
                 registered_w=False):
        super().__init__()
        self.encoder = _shim_encoder(nfeats, sigmas or [1.0] * nfeats,
                                     seed=seed, registered=registered_w)
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
        # CUDA-demoted reality: the freqs are NOT in the state_dict and
        # must come from the pickled encoder module.
        assert "encoder.w" not in mirror.state_dict()
        params, constants = flax_from_torch_state(mirror.state_dict(),
                                                  encoder=mirror.encoder)
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
        params, constants = flax_from_torch_state(mirror.state_dict(),
                                                  encoder=mirror.encoder)
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


class TestFrequencyRecovery:
    """The three sources of the Fourier frequency matrix, in preference
    order: state_dict (CPU-saved), pickled encoder __dict__ (CUDA-saved —
    all published artifacts), deterministic seed-0 replay
    (reference positional_encoding.py:164-171, neti_mapper.py:517-518)."""

    def test_registered_w_prefers_state_dict(self):
        mirror = _TorchRefMapper(2, WORD_DIM * 2, seed=4,
                                 sigmas=[0.03, 2.0], registered_w=True)
        sd = mirror.state_dict()
        assert "encoder.w" in sd
        _, constants = flax_from_torch_state(sd)   # no encoder needed
        np.testing.assert_array_equal(constants["fourier_w"],
                                      mirror.encoder.w.detach().numpy())

    def test_seed0_replay_when_pickled_w_missing(self):
        """An encoder whose __dict__ lost ``w`` still converts: the
        importer replays torch.manual_seed(0) + randn*sigmas exactly as
        the reference constructor would on reload."""
        sigmas = [0.03, 2.0] + [0.5] * 12
        mirror = _TorchRefMapper(14, WORD_DIM * 2, seed=0, sigmas=sigmas)
        expect = mirror.encoder.w.detach().numpy().copy()
        del mirror.encoder.w
        assert getattr(mirror.encoder, "w", None) is None
        _, constants = flax_from_torch_state(mirror.state_dict(),
                                             encoder=mirror.encoder)
        np.testing.assert_array_equal(constants["fourier_w"], expect)

    def test_arch15_without_any_source_raises(self, tmp_path):
        mirror = _TorchRefMapper(14, WORD_DIM * 2, seed=1,
                                 sigmas=[0.03, 2.0] + [0.5] * 12)
        del mirror.encoder.w
        del mirror.encoder.sigmas
        pt = tmp_path / "mapper-steps-1_view.pt"
        _save_ref_view_ckpt(pt, mirror)
        with pytest.raises(ValueError, match="Fourier frequency"):
            convert_mapper_checkpoint(pt, "view")


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


class TestTorchExport:
    """Export direction: msgpack -> reference torch formats
    (reference checkpoint_handler.py:40-97 shapes, loadable by the
    reference's strict load_mapper, checkpoint_handler.py:210)."""

    SIGMAS = PESigmas(sigma_t=0.03, sigma_l=2.0, sigma_dtu12=0.5)

    def _native_view_ckpt(self, tmp_path):
        from view_neti_tpu.checkpoint import CheckpointHandler
        m = NeTIMapper(embedding_type="view", output_dim=WORD_DIM,
                       arch_view_net=15, arch_view_disable_tl=False,
                       use_nested_dropout=False, num_view_cond_dims=12,
                       pe_sigmas=self.SIGMAS)
        variables = m.init(jax.random.PRNGKey(7), jnp.zeros((1,)),
                           jnp.zeros((1,)),
                           view_params=jnp.zeros((1, 12)))
        cfg = decode(RunConfig, {
            "learnable_mode": 2,
            "model": {"arch_view_net": 15, "word_embedding_dim": WORD_DIM,
                      "arch_view_disable_tl": False,
                      "pe_sigmas": {"sigma_t": 0.03, "sigma_l": 2.0,
                                    "sigma_dtu12": 0.5}},
            "data": {"camera_representation": "dtu-12d", "dtu_subset": 6}})
        handler = CheckpointHandler(cfg, ["<view_x>"], [500], [], [],
                                    tmp_path)
        paths = handler.save_mapper(
            {"view": variables["params"]}, None,
            variables["constants"], None, "mapper-steps-3000.msgpack")
        return paths[0], variables

    def test_view_export_is_reference_shaped(self, tmp_path):
        msgpack_path, variables = self._native_view_ckpt(tmp_path)
        written = export_torch_artifacts(tmp_path / "t",
                                         view_path=msgpack_path)
        assert written[0].name == "mapper-steps-3000_view.pt"
        ckpt = load_torch_checkpoint(written[0])

        # reference save_mapper view shape (checkpoint_handler.py:80-97)
        assert list(ckpt["mappers"]) == ["dummy_key"]
        entry = ckpt["mappers"]["dummy_key"]
        assert entry["placeholder_object_token"] == "dummy"

        # the state_dict strict-loads into a reference-keyed module
        # (encoder.w must NOT be a key: the reference registers none)
        assert "encoder.w" not in entry["state_dict"]
        mirror = _TorchRefMapper(14, WORD_DIM * 2, seed=9,
                                 sigmas=[0.03, 2.0] + [0.5] * 12)
        mirror.load_state_dict(entry["state_dict"], strict=True)

        # pickled encoder carries the freqs + construction attrs
        enc = entry["encoder"]
        np.testing.assert_array_equal(
            enc.w.numpy(),
            np.asarray(variables["constants"]["fourier_w"], np.float32))
        assert enc.dim == 2 * variables["constants"]["fourier_w"].shape[0]
        assert enc.sigmas == [0.03, 2.0] + [0.5] * 12

        # cfg filtered to the reference's exact field surface
        assert set(ckpt["cfg"]) <= _REF_CFG_TOP
        for sect, allowed in _REF_CFG_FIELDS.items():
            assert set(ckpt["cfg"][sect]) <= allowed, sect
        assert "parallel" not in ckpt["cfg"]

    def test_view_export_reimports_bit_exact(self, tmp_path):
        msgpack_path, variables = self._native_view_ckpt(tmp_path)
        written = export_torch_artifacts(tmp_path / "t",
                                         view_path=msgpack_path)
        back = convert_mapper_checkpoint(written[0], "view")
        entry = back["mappers"]["view"]
        expect = jax.device_get(variables["params"])
        for name in ("net_dense0", "net_ln0", "net_dense1", "net_ln1",
                     "output_layer"):
            for leaf in expect[name]:
                np.testing.assert_array_equal(
                    np.asarray(entry["params"][name][leaf]),
                    np.asarray(expect[name][leaf], np.float32))
        np.testing.assert_array_equal(
            np.asarray(entry["constants"]["fourier_w"]),
            np.asarray(variables["constants"]["fourier_w"], np.float32))

    def test_object_export_roundtrip(self, tmp_path):
        from view_neti_tpu.checkpoint import CheckpointHandler
        m = NeTIMapper(embedding_type="object", output_dim=WORD_DIM,
                       arch_view_net=15, use_nested_dropout=False,
                       pe_sigmas=self.SIGMAS)
        v1 = m.init(jax.random.PRNGKey(1), jnp.zeros((1,)), jnp.zeros((1,)))
        v2 = m.init(jax.random.PRNGKey(2), jnp.zeros((1,)), jnp.zeros((1,)))
        stacked = jax.tree_util.tree_map(
            lambda a, b: np.stack([np.asarray(a), np.asarray(b)]),
            v1["params"], v2["params"])
        cfg = decode(RunConfig, {
            "learnable_mode": 3,
            "model": {"arch_view_net": 15, "word_embedding_dim": WORD_DIM,
                      "arch_view_disable_tl": False},
            "data": {"camera_representation": "dtu-12d", "dtu_subset": 6,
                     "placeholder_object_tokens": ["<skull>", "<house>"],
                     "super_category_object_tokens": ["object", "object"]}})
        handler = CheckpointHandler(cfg, [], [], ["<skull>", "<house>"],
                                    [501, 502], tmp_path)
        paths = handler.save_mapper({"object": stacked},
                                    v1["constants"], None, None,
                                    "mapper-steps-900.msgpack")
        written = export_torch_artifacts(tmp_path / "t",
                                         object_path=paths[0])
        ckpt = load_torch_checkpoint(written[0])
        # int keys (reference save keys by tokenizer id); entries carry
        # the real token strings the reference's load actually uses
        assert all(isinstance(k, int) for k in ckpt["mappers"])
        toks = {e["placeholder_object_token"]
                for e in ckpt["mappers"].values()}
        assert toks == {"<skull>", "<house>"}

        back = convert_mapper_checkpoint(written[0], "object")
        assert set(back["mappers"]) == {"<skull>", "<house>"}
        np.testing.assert_array_equal(
            np.asarray(back["mappers"]["<house>"]["params"]
                       ["output_layer"]["bias"]),
            np.asarray(v2["params"]["output_layer"]["bias"], np.float32))

    def test_learned_embeds_export_roundtrip(self, tmp_path):
        from flax import serialization
        rows = {"<view_x>": np.random.RandomState(0)
                .randn(WORD_DIM).astype(np.float32),
                "<skull>": np.random.RandomState(1)
                .randn(WORD_DIM).astype(np.float32)}
        src = tmp_path / "learned_embeds-steps-3000.msgpack"
        src.write_bytes(serialization.msgpack_serialize(rows))
        written = export_torch_artifacts(tmp_path / "t", embeds_path=src)
        assert written[0].name == "learned_embeds-steps-3000.bin"
        back = convert_learned_embeds(written[0])
        for t in rows:
            np.testing.assert_array_equal(back[t], rows[t])

    def test_legacy_pe1_state_roundtrip(self):
        """Legacy PE-1 object mapper: torch sd -> flax -> torch sd is the
        identity on the reference's registered keys (encoder.w stays out
        of the state_dict, as in the reference — it rides the pickled
        encoder; reference neti_mapper.py:96-108)."""
        from view_neti_tpu.torch_interop import torch_state_from_flax
        torch.manual_seed(2)
        sd = {
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
        params, _ = flax_from_torch_state(dict(sd))
        back = torch_state_from_flax(params)
        assert set(back) == set(sd)
        for k in sd:
            np.testing.assert_array_equal(back[k].numpy(), sd[k].numpy())

    def test_original_ti_state_roundtrip(self):
        from view_neti_tpu.torch_interop import torch_state_from_flax
        sd = {"ti_embeddings": torch.randn(4, WORD_DIM)}
        params, _ = flax_from_torch_state(dict(sd))
        back = torch_state_from_flax(params)
        assert set(back) == {"ti_embeddings"}
        np.testing.assert_array_equal(back["ti_embeddings"].numpy(),
                                      sd["ti_embeddings"].numpy())

    def test_make_torch_encoder_neti_w(self):
        """Legacy NeTI anchor encoder export carries w + construction
        attrs (reference positional_encoding.py:10-41)."""
        from view_neti_tpu.torch_interop import make_torch_encoder
        cfg = decode(RunConfig, {
            "model": {"pe_sigmas": {"sigma_t": 0.03, "sigma_l": 2.0}}})
        w = np.random.RandomState(3).randn(1024, 2).astype(np.float32)
        enc = make_torch_encoder({"neti_w": w}, cfg)
        assert type(enc).__name__ == "NeTIPositionalEncoding"
        np.testing.assert_array_equal(enc.w.numpy(), w)
        assert enc.sigma_t == 0.03 and enc.sigma_l == 2.0
        assert enc.num_w == 1024


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
            mirror.state_dict(), encoder=mirror.encoder)
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

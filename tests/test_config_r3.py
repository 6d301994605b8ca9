"""Round-3 config/optim surface: InferenceConfig CLI parity, the
do_t2i_generalization gate, and the host-side lr table."""
import numpy as np
import pytest

from view_neti_tpu.config import (InferenceConfig, RunConfig, decode,
                                  parse_cli)

pytestmark = pytest.mark.quick


class TestInferenceConfigCLI:
    def test_yaml_plus_overrides(self, tmp_path):
        y = tmp_path / "inference.yaml"
        y.write_text("input_dir: results/exp\niteration: 1500\n"
                     "seeds: [0, 1]\ntorch_dtype: fp16\n"
                     "num_denoising_steps: 30\n")
        cfg = parse_cli(["--config_path", str(y),
                         "--iteration", "3000",
                         "--seeds", "[5]"], cls=InferenceConfig)
        assert cfg.iteration == 3000
        assert cfg.seeds == [5]
        assert str(cfg.input_dir) == "results/exp"
        # reference InferenceConfig.__post_init__ default
        assert str(cfg.inference_dir) == "results/exp/inference"

    def test_explicit_inference_dir_wins(self):
        cfg = parse_cli(["--input_dir", "a", "--inference_dir", "b",
                         "--iteration", "1"], cls=InferenceConfig)
        assert str(cfg.inference_dir) == "b"

    def test_shipped_yaml_decodes(self):
        from pathlib import Path
        shipped = Path(__file__).parents[1] / "input_configs"
        cfg = parse_cli(["--config_path", str(shipped / "inference.yaml")],
                        cls=InferenceConfig)
        assert cfg.iteration == 1500 and cfg.num_denoising_steps == 30

    def test_reference_fields_roundtrip(self):
        cfg = parse_cli(
            ["--input_dir", "x", "--iteration", "2",
             "--eval_placeholder_object_tokens", "[<a>, <b>]",
             "--torch_dtype", "fp32", "--debug", "1"],
            cls=InferenceConfig)
        assert cfg.eval_placeholder_object_tokens == ["<a>", "<b>"]
        assert cfg.torch_dtype == "fp32" and cfg.debug == 1


class TestT2IGate:
    def test_default_off(self):
        cfg = decode(RunConfig, {})
        assert cfg.eval.do_t2i_generalization is False

    def test_cli_flag(self):
        cfg = parse_cli(["--eval.do_t2i_generalization", "true"])
        assert cfg.eval.do_t2i_generalization is True


class TestHostLrTable:
    def test_matches_schedule_on_cpu(self):
        import jax.numpy as jnp
        from view_neti_tpu.training.optim import (host_lr_table,
                                                  make_lr_schedule)
        for kind in ("constant", "constant_with_warmup", "linear",
                     "cosine"):
            sched = make_lr_schedule(kind, 1e-3, warmup_steps=5,
                                     total_steps=50)
            table = host_lr_table(sched, 50)
            assert isinstance(table, np.ndarray)
            assert table.shape == (52,)
            for s in (0, 1, 5, 25, 50):
                np.testing.assert_allclose(
                    table[s], float(sched(jnp.asarray(s))), rtol=1e-6)


class TestYamlSurfaceParity:
    """Every shipped YAML decodes, and — the stronger claim — the
    REFERENCE'S OWN input_configs decode unchanged through our config
    system (field names, nesting, and YAML-typing parity with pyrallis)."""

    def _decode_yaml(self, path, cls=RunConfig):
        import yaml
        with open(path) as f:
            return decode(cls, yaml.safe_load(f) or {})

    def test_our_shipped_train_yamls_decode(self):
        from pathlib import Path
        shipped = Path(__file__).parents[1] / "input_configs"
        for name in ("train.yaml", "train_mode0.yaml", "train_m3.yaml",
                     "train_m3_88scenes.yaml"):
            cfg = self._decode_yaml(shipped / name)
            assert cfg.optim.train_batch_size <= 3

    def test_reference_train_yaml_decodes_via_readme_command(self):
        """The reference's shipped train.yaml sets learnable_mode 3 but is
        incomplete for it (no subsets/tokens) — their README ALWAYS
        overrides --learnable_mode on the CLI (reference README.md:43,60).
        Replicate their exact mode-2 command through our parse_cli."""
        from pathlib import Path
        ref = Path("/root/reference/input_configs")
        if not ref.exists():
            import pytest
            pytest.skip("reference tree not present")
        cfg = parse_cli([
            "--config_path", str(ref / "train.yaml"),
            "--log.exp_name", "mode2_scan114", "--learnable_mode", "2",
            "--optim.max_train_steps", "3000",
            "--data.train_data_dir", "data/dtu/Rectified/scan114",
            "--data.dtu_subset", "6"])
        # the shipped reference hyperparameters that matter
        assert cfg.learnable_mode == 2
        assert cfg.model.word_embedding_dim == 1024          # SD-2.1
        assert cfg.model.arch_view_net == 15
        assert cfg.model.pe_sigma_exp_key == 2
        assert cfg.model.output_bypass_alpha_view == 5
        assert cfg.data.augmentation_key == 7
        assert cfg.optim.gradient_accumulation_steps == 3
        assert cfg.optim.max_train_steps == 3000
        # pe_sigma_exp_key 2 resolves sigma_dtu12 = 0.5
        # (reference config.py:151-154)
        assert cfg.model.pe_sigmas.sigma_dtu12 == 0.5

    def test_reference_mode3_yamls_decode_unchanged(self):
        from pathlib import Path
        ref = Path("/root/reference/input_configs")
        if not ref.exists():
            import pytest
            pytest.skip("reference tree not present")
        cfg = self._decode_yaml(ref / "train_m3.yaml")
        assert cfg.learnable_mode == 3
        assert cfg.data.train_data_subsets
        assert len(cfg.data.placeholder_object_tokens) == len(
            cfg.data.super_category_object_tokens)
        cfg88 = self._decode_yaml(ref / "train_m3_88scenes.yaml")
        assert len(cfg88.data.placeholder_object_tokens) == 88

    def test_reference_inference_yaml_decodes_unchanged(self):
        from pathlib import Path
        ref = Path("/root/reference/input_configs/inference.yaml")
        if not ref.exists():
            import pytest
            pytest.skip("reference tree not present")
        cfg = self._decode_yaml(ref, cls=InferenceConfig)
        assert cfg.iteration == 1500
        assert cfg.seeds == [0, 1]
        assert cfg.torch_dtype == "fp16"

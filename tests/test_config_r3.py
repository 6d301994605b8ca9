"""Round-3 config/optim surface: InferenceConfig CLI parity, the
do_t2i_generalization gate, and the host-side lr table."""
import numpy as np

from view_neti_tpu.config import (InferenceConfig, RunConfig, decode,
                                  parse_cli)


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

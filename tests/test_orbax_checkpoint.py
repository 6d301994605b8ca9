"""Orbax sharded-checkpoint backend: save/restore roundtrip on the
8-virtual-device mesh (VERDICT r1 item 9; PARITY known gap)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytest.importorskip("orbax.checkpoint")

from view_neti_tpu import checkpoint_orbax
from view_neti_tpu.parallel import mesh as pmesh


def _state(rng):
    return {
        "trainable": {
            "object": {"net_dense0": {"kernel": rng.randn(2, 8, 16)
                                      .astype(np.float32)}},
            "view": {"net_dense0": {"kernel": rng.randn(8, 16)
                                    .astype(np.float32)}},
        },
        "opt_state": {"mu": rng.randn(8, 16).astype(np.float32),
                      "count": np.asarray(7, np.int32)},
    }


class TestOrbaxRoundtrip:
    def test_host_roundtrip(self, tmp_path):
        rng = np.random.RandomState(0)
        state = jax.tree_util.tree_map(jnp.asarray, _state(rng))
        path = checkpoint_orbax.save_train_state(tmp_path / "state-1", state)
        restored = checkpoint_orbax.restore_train_state(path, state)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)), state, restored)

    def test_sharded_roundtrip_on_mesh(self, tmp_path):
        """Arrays placed on the mesh save and restore WITH shardings —
        the multi-host contract (each host reads only its shards)."""
        mesh = pmesh.make_mesh(n_dp=4, n_tp=2)
        rep = pmesh.replicated(mesh)
        dp = pmesh.batch_sharding(mesh)
        rng = np.random.RandomState(1)
        host = _state(rng)
        shardings = jax.tree_util.tree_map(lambda _: rep, host)
        # dp-shard one big leaf to prove non-trivial sharding roundtrips
        shardings["opt_state"]["mu"] = dp
        state = pmesh.shard_pytree(
            jax.tree_util.tree_map(jnp.asarray, host), shardings)
        path = checkpoint_orbax.save_train_state(tmp_path / "state-2", state)
        restored = checkpoint_orbax.restore_train_state(
            path, state, shardings=shardings)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)), state, restored)
        assert restored["opt_state"]["mu"].sharding.is_equivalent_to(
            dp, restored["opt_state"]["mu"].ndim)

    def test_coach_resume_from_latest(self, tmp_path):
        """End-to-end resume (log.resume_from): a fresh Coach restores
        trainable params, optimizer state, and the global step from the
        newest orbax state and continues counting from there."""
        from pathlib import Path

        from view_neti_tpu.config import RunConfig, decode
        from view_neti_tpu.training import builder
        from view_neti_tpu.training.coach import Coach

        teapot = Path("/root/reference/data/datasets_mode0/colorful_teapot")
        if not teapot.exists():
            pytest.skip("bundled data missing")
        data = {"learnable_mode": 0,
                "data": {"train_data_dir": str(teapot), "repeats": 2,
                         "resolution": 16, "flip_p": 0.0},
                "model": {"arch_view_net": 15, "word_embedding_dim": 32},
                "log": {"exp_dir": str(tmp_path),
                        "save_dataset_images": False,
                        "checkpoint_backend": "orbax", "save_steps": 2},
                "optim": {"max_train_steps": 2, "train_batch_size": 2,
                          "gradient_accumulation_steps": 1}}
        cfg = decode(RunConfig, data)
        coach = Coach(cfg, arch=builder.tiny_arch())
        coach.train()  # saves state-2 (save_steps=2) and the final state
        assert (tmp_path / "orbax" / "state-2").exists()

        data["log"]["resume_from"] = "latest"
        data["optim"]["max_train_steps"] = 3
        cfg2 = decode(RunConfig, data)
        coach2 = Coach(cfg2, arch=builder.tiny_arch())
        assert coach2.global_step == 2
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)),
            coach.trainable, coach2.trainable)
        result = coach2.train()  # one more optimizer step
        assert result["steps"] == 3

    def test_overwrite_same_path(self, tmp_path):
        rng = np.random.RandomState(2)
        s1 = jax.tree_util.tree_map(jnp.asarray, _state(rng))
        s2 = jax.tree_util.tree_map(lambda x: x + 1, s1)
        p = checkpoint_orbax.save_train_state(tmp_path / "state", s1)
        checkpoint_orbax.save_train_state(tmp_path / "state", s2)
        restored = checkpoint_orbax.restore_train_state(p, s1)
        np.testing.assert_allclose(
            np.asarray(restored["opt_state"]["mu"]),
            np.asarray(s2["opt_state"]["mu"]))

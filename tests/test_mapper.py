"""Tests: positional encodings, view tables, NeTIMapper, DDPM schedule."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from view_neti_tpu.models import positional_encoding as pe
from view_neti_tpu.models.neti_mapper import NeTIMapper, lookup_view_rows
from view_neti_tpu.models.view_tokens import (build_view_token_table,
                                              scale_m1_1)
from view_neti_tpu.data import dtu
from view_neti_tpu.schedulers.ddpm import DDPMSchedule
from view_neti_tpu.utils.types import PESigmas


class TestFourierPE:
    def test_shapes_and_range(self):
        w = pe.make_fourier_freqs(0, 64, [0.03, 2.0])
        assert w.shape == (32, 2)
        x = jnp.array([[0.5, -0.5], [0.1, 0.9]])
        v = pe.fourier_encode(w, x)
        assert v.shape == (2, 64)
        assert jnp.all(jnp.abs(v) <= 1.0 + 1e-6)

    def test_sigma_scaling(self):
        w1 = pe.make_fourier_freqs(0, 64, [1.0, 1.0])
        w2 = pe.make_fourier_freqs(0, 64, [2.0, 2.0])
        np.testing.assert_allclose(np.asarray(w2), 2 * np.asarray(w1),
                                   rtol=1e-6)

    def test_normalize(self):
        w = pe.make_fourier_freqs(0, 64, [1.0])
        v = pe.fourier_encode(w, jnp.ones((3, 1)), normalize=True)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(v), axis=-1),
                                   1.0, rtol=1e-5)

    def test_no_grad_through_freqs(self):
        w = pe.make_fourier_freqs(0, 8, [1.0])
        g = jax.grad(lambda w_: pe.fourier_encode(
            w_, jnp.ones((1, 1))).sum())(w)
        np.testing.assert_allclose(np.asarray(g), 0.0)

    def test_neti_encode_unit_norm(self):
        w = pe.make_neti_freqs(0, 0.03, 2.0, num_w=128)
        v = pe.neti_encode(w, jnp.array([10., 500.]), jnp.array([0., 15.]))
        assert v.shape == (2, 256)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(v), axis=-1),
                                   1.0, rtol=1e-5)

    def test_basic_encode(self):
        v = pe.basic_encode(jnp.array([0., 999.]), jnp.array([0., 15.]))
        np.testing.assert_allclose(np.asarray(v),
                                   [[-1, -1], [1, 1]], atol=1e-6)


class TestViewTable:
    def _dtu_tokens(self, n=4):
        rng = np.random.RandomState(0)
        toks, ids = [], []
        for i in range(n):
            cam = rng.randn(3, 4).astype(np.float32)
            toks.append(dtu.dtu_cam_params_to_token(cam, i))
            ids.append(49408 + i)
        return toks, ids

    def test_dtu_table(self, tmp_path, monkeypatch):
        toks, ids = self._dtu_tokens()
        caldir = tmp_path / "cal"
        caldir.mkdir()
        rng = np.random.RandomState(1)
        for i in range(1, 7):
            m = rng.randn(3, 4) * 3
            (caldir / f"pos_{i:03d}.txt").write_text(
                "\n".join(" ".join(str(x) for x in row) for row in m))
        table = build_view_token_table(toks, ids, calibration_dir=str(caldir))
        assert table.deg_freedom == "dtu-12d"
        assert table.params_scaled().shape == (4, 12)

    def test_spherical_phi_only(self):
        toks = [f"<view_30_{p}_1p2>" for p in (0, 45, 90)]
        table = build_view_token_table(toks, [49408, 49409, 49410])
        assert table.deg_freedom == "phi"
        s = table.params_scaled()
        assert s.shape == (3, 1)
        np.testing.assert_allclose(s[:, 0], [-1, 0, 1], atol=1e-6)

    def test_spherical_theta_phi(self):
        toks = ["<view_30_0_1>", "<view_60_45_1>", "<view_30_90_1>"]
        table = build_view_token_table(toks, [1, 2, 3])
        assert table.deg_freedom == "theta-phi"
        assert table.params_scaled().shape == (3, 2)

    def test_extend_no_refit(self):
        toks = [f"<view_30_{p}_1>" for p in (0, 90)]
        table = build_view_token_table(toks, [10, 11])
        ext = table.extend(["<view_30_180_1>"], [12])
        # bounds unchanged: novel phi=180 maps beyond (-1, 1)
        np.testing.assert_array_equal(ext.mins, table.mins)
        assert ext.params_scaled()[-1, 0] == pytest.approx(3.0)
        # re-extending same token is a no-op
        assert ext.extend(["<view_30_180_1>"], [12]) is ext

    def test_scale_m1_1_degenerate(self):
        x = np.array([[2.0, 5.0]])
        out = scale_m1_1(x, np.array([2.0, 0.0]), np.array([2.0, 10.0]))
        np.testing.assert_allclose(out, [[2.0, 0.0]])

    def test_lookup_rows(self):
        rows = lookup_view_rows(jnp.array([12, 10, 11]),
                                jnp.array([10, 11, 12]))
        np.testing.assert_array_equal(np.asarray(rows), [2, 0, 1])


def _mk_mapper(**kw):
    defaults = dict(embedding_type="object", output_dim=32,
                    arch_mlp_hidden_dims=16, arch_view_net=15,
                    pe_sigmas=PESigmas(), norm_scale=None,
                    use_nested_dropout=True, output_bypass=True)
    defaults.update(kw)
    return NeTIMapper(**defaults)


class TestNeTIMapper:
    def test_object_arch15_shapes(self):
        m = _mk_mapper()
        t = jnp.array([100., 500., 900.])
        l = jnp.array([0., 7., 15.])
        vars_ = m.init({"params": jax.random.PRNGKey(0)}, t, l)
        out = m.apply(vars_, t, l)
        assert out.word_embedding.shape == (3, 32)
        assert out.bypass_output.shape == (3, 32)
        assert "constants" in vars_ and "fourier_w" in vars_["constants"]
        assert vars_["constants"]["fourier_w"].shape == (32, 2)

    def test_view_arch15_with_camera(self):
        m = _mk_mapper(embedding_type="view", num_view_cond_dims=12,
                       arch_view_disable_tl=False)
        t = jnp.array([100.])
        l = jnp.array([3.])
        cam = jnp.zeros((1, 12))
        vars_ = m.init({"params": jax.random.PRNGKey(0)}, t, l, cam)
        out = m.apply(vars_, t, l, cam)
        assert out.word_embedding.shape == (1, 32)
        # view arch 15 hidden width is fixed 64
        assert vars_["params"]["net_dense0"]["kernel"].shape == (64, 64)

    def test_no_bypass(self):
        m = _mk_mapper(output_bypass=False, bypass_unconstrained=False)
        t, l = jnp.array([1.]), jnp.array([1.])
        vars_ = m.init({"params": jax.random.PRNGKey(0)}, t, l)
        out = m.apply(vars_, t, l)
        assert out.bypass_output is None

    def test_norm_scale(self):
        m = _mk_mapper(norm_scale=0.37)
        t, l = jnp.array([5., 10.]), jnp.array([0., 1.])
        vars_ = m.init({"params": jax.random.PRNGKey(0)}, t, l)
        out = m.apply(vars_, t, l)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(out.word_embedding), axis=-1),
            0.37, rtol=1e-5)

    def test_nested_dropout_train(self):
        m = _mk_mapper(nested_dropout_prob=1.0, output_bypass=False,
                       bypass_unconstrained=False, norm_scale=None)
        t = jnp.full((8,), 500.)
        l = jnp.zeros((8,))
        vars_ = m.init({"params": jax.random.PRNGKey(0)}, t, l)
        # hook into the hidden layer via truncation at eval as a proxy:
        # with prob 1.0 every row must have a zero tail in the hidden repr.
        # Check train != eval output for some rows (dropout had an effect).
        out_eval = m.apply(vars_, t, l).word_embedding
        out_train = m.apply(vars_, t, l, train=True,
                            rngs={"dropout": jax.random.PRNGKey(1)}
                            ).word_embedding
        assert not np.allclose(np.asarray(out_eval), np.asarray(out_train))

    def test_truncation_idx_zero_kills_hidden(self):
        m = _mk_mapper(output_bypass=False, bypass_unconstrained=False)
        t, l = jnp.array([500.]), jnp.array([3.])
        vars_ = m.init({"params": jax.random.PRNGKey(0)}, t, l)
        out0 = m.apply(vars_, t, l, truncation_idx=0).word_embedding
        # hidden zeroed entirely -> output equals output_layer bias
        bias = vars_["params"]["output_layer"]["bias"]
        np.testing.assert_allclose(np.asarray(out0)[0], np.asarray(bias),
                                   atol=1e-6)

    def test_legacy_neti_pe_object(self):
        m = _mk_mapper(arch_view_net=0, use_positional_encoding=1,
                       num_pe_time_anchors=10)
        t, l = jnp.array([100.]), jnp.array([3.])
        vars_ = m.init({"params": jax.random.PRNGKey(0)}, t, l)
        out = m.apply(vars_, t, l)
        assert out.word_embedding.shape == (1, 32)
        # input layer is (2048 -> 160)
        assert vars_["params"]["input_layer"]["kernel"].shape == (2048, 160)

    def test_legacy_basic_encoder_object(self):
        m = _mk_mapper(arch_view_net=0, use_positional_encoding=0)
        t, l = jnp.array([100.]), jnp.array([3.])
        vars_ = m.init({"params": jax.random.PRNGKey(0)}, t, l)
        assert m.apply(vars_, t, l).word_embedding.shape == (1, 32)

    def test_original_ti(self):
        init = np.ones((32,), np.float32) * 0.5
        m = _mk_mapper(original_ti=True, output_bypass=False,
                       bypass_unconstrained=False, ti_init_embed=init)
        t, l = jnp.array([1., 2.]), jnp.array([0., 0.])
        vars_ = m.init({"params": jax.random.PRNGKey(0)}, t, l)
        out = m.apply(vars_, t, l)
        np.testing.assert_allclose(np.asarray(out.word_embedding), 0.5)

    def test_original_ti_rejects_bypass(self):
        with pytest.raises(ValueError):
            m = _mk_mapper(original_ti=True, output_bypass=True)
            m.init({"params": jax.random.PRNGKey(0)},
                   jnp.array([1.]), jnp.array([0.]))

    def test_grads_flow_to_params_not_constants(self):
        m = _mk_mapper()
        t, l = jnp.array([500.]), jnp.array([3.])
        vars_ = m.init({"params": jax.random.PRNGKey(0)}, t, l)

        def loss(params):
            out = m.apply({"params": params,
                           "constants": vars_["constants"]}, t, l)
            return jnp.sum(out.word_embedding ** 2)

        g = jax.grad(loss)(vars_["params"])
        total = sum(float(np.abs(x).sum())
                    for x in jax.tree_util.tree_leaves(g))
        assert total > 0


class TestDDPM:
    def test_add_noise_endpoints(self):
        s = DDPMSchedule()
        x = jnp.ones((2, 4, 4, 1))
        n = jnp.zeros_like(x)
        t = jnp.array([0, 999])
        noisy = np.asarray(s.add_noise(x, n, t))
        assert noisy[0].mean() == pytest.approx(
            np.sqrt(s.alphas_cumprod[0]), rel=1e-5)
        assert noisy[1].mean() == pytest.approx(
            np.sqrt(s.alphas_cumprod[999]), rel=1e-4)

    def test_alphas_monotone(self):
        s = DDPMSchedule()
        assert (np.diff(s.alphas_cumprod) < 0).all()
        assert s.alphas_cumprod[0] > 0.99
        assert s.alphas_cumprod[-1] < 0.01

    def test_velocity_identity(self):
        # v = sqrt(a) eps - sqrt(1-a) x; add_noise = sqrt(a) x + sqrt(1-a) eps
        # then x = sqrt(a) x_t - sqrt(1-a) v_t must hold.
        s = DDPMSchedule()
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (3, 8))
        eps = jax.random.normal(jax.random.PRNGKey(1), (3, 8))
        t = jnp.array([10, 500, 990])
        xt = s.add_noise(x, eps, t)
        v = s.get_velocity(x, eps, t)
        acp = jnp.asarray(s.alphas_cumprod)[t][:, None]
        x_rec = jnp.sqrt(acp) * xt - jnp.sqrt(1 - acp) * v
        np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x),
                                   atol=1e-5)

    def test_target_types(self):
        x = jnp.ones((1, 4))
        eps = jnp.full((1, 4), 2.0)
        t = jnp.array([500])
        s_eps = DDPMSchedule(prediction_type="epsilon")
        np.testing.assert_allclose(np.asarray(s_eps.target(x, eps, t)), 2.0)
        s_v = DDPMSchedule(prediction_type="v_prediction")
        assert not np.allclose(np.asarray(s_v.target(x, eps, t)), 2.0)

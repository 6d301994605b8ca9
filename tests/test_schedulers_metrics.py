"""Tests: DPM-Solver++ scheduler, SSIM/PSNR/LPIPS metrics."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from view_neti_tpu.schedulers.dpm_solver import DPMSolverSchedule
from view_neti_tpu.schedulers.ddpm import DDPMSchedule
from view_neti_tpu.ops import metrics as M


class TestDPMSolver:
    def test_timestep_spacing(self):
        s = DPMSolverSchedule()
        ts = s.set_timesteps(30)
        assert len(ts) == 30
        assert ts[0] == 999 and ts[-1] > 0
        assert (np.diff(ts) < 0).all()

    def test_coefficients_monotone(self):
        s = DPMSolverSchedule()
        ts = s.set_timesteps(10)
        c = s.coefficients(ts)
        assert len(c["alpha"]) == 11
        assert (np.diff(c["alpha"]) > 0).all()     # alpha grows as t -> 0
        assert (np.diff(c["sigma"]) < 0).all()
        assert (np.diff(c["lambda"]) > 0).all()

    def test_x0_prediction_types(self):
        s_eps = DPMSolverSchedule(prediction_type="epsilon")
        s_v = DPMSolverSchedule(prediction_type="v_prediction")
        x = jnp.ones((1, 4))
        out = jnp.full((1, 4), 0.5)
        a, sg = 0.9, jnp.sqrt(1 - 0.81)
        x0e = s_eps.to_x0(out, x, a, sg)
        np.testing.assert_allclose(np.asarray(x0e),
                                   (1 - float(sg) * 0.5) / 0.9, rtol=1e-5)
        x0v = s_v.to_x0(out, x, a, sg)
        np.testing.assert_allclose(np.asarray(x0v), 0.9 - float(sg) * 0.5,
                                   rtol=1e-5)

    def test_denoising_pulls_toward_x0(self):
        """With a perfect epsilon oracle for a known x0, the sampler must
        recover x0 (deterministic DPM-Solver++ limit)."""
        s = DPMSolverSchedule()
        ts = s.set_timesteps(25)
        coeffs = s.coefficients(ts)
        alpha = jnp.asarray(coeffs["alpha"])
        sigma = jnp.asarray(coeffs["sigma"])
        x0_true = jnp.asarray(np.random.RandomState(0).randn(2, 8),
                              jnp.float32)
        eps_true = jnp.asarray(np.random.RandomState(1).randn(2, 8),
                               jnp.float32)
        x = alpha[0] * x0_true + sigma[0] * eps_true
        x0_prev = jnp.zeros_like(x)
        for i in range(25):
            # oracle model output: the exact eps for the current state
            eps = (x - alpha[i] * x0_true) / sigma[i]
            x, x0_prev = s.step(eps, jnp.asarray(i), x, x0_prev, coeffs, 25)
        # the schedule terminates at t=0 where sigma(0) ~ 0.03, so the
        # sampler carries an O(sigma_0) bias; check recovery to that level
        err = float(jnp.abs(x - x0_true).max())
        assert err < 0.12, err
        # and the residual noise has shrunk dramatically vs the start
        assert err < 0.05 * float(jnp.abs(eps_true).max())

    def test_lower_order_final_gate(self):
        """diffusers applies the final-step first-order fallback only when
        num_steps < 15; at 30 steps (the reference's protocol) the last step
        must stay second-order, i.e. depend on x0_prev."""
        s = DPMSolverSchedule()
        rng = np.random.RandomState(0)
        sample = jnp.asarray(rng.randn(2, 8), jnp.float32)
        out = jnp.asarray(rng.randn(2, 8), jnp.float32)
        prev_a = jnp.asarray(rng.randn(2, 8), jnp.float32)
        prev_b = jnp.asarray(rng.randn(2, 8), jnp.float32)

        def last_step(n, prev):
            ts = s.set_timesteps(n)
            coeffs = s.coefficients(ts)
            x, _ = s.step(out, jnp.asarray(n - 1), sample, prev, coeffs, n)
            return np.asarray(x)

        # 30 steps: second-order at the last step -> depends on x0_prev
        assert np.abs(last_step(30, prev_a) - last_step(30, prev_b)).max() > 1e-6
        # 10 steps: first-order fallback -> independent of x0_prev
        np.testing.assert_allclose(last_step(10, prev_a), last_step(10, prev_b))

    def test_consistency_with_ddpm_schedule(self):
        dpm = DPMSolverSchedule()
        ddpm = DDPMSchedule()
        np.testing.assert_allclose(dpm.alphas_cumprod,
                                   ddpm.alphas_cumprod.astype(np.float64),
                                   rtol=1e-5)


class TestMetrics:
    def test_masked_mse_psnr(self):
        pred = jnp.zeros((1, 8, 8, 3))
        gt = jnp.ones((1, 8, 8, 3)) * 0.5
        mask = jnp.ones((1, 8, 8, 1))
        mse = float(M.masked_mse(pred, gt, mask)[0])
        assert mse == pytest.approx(0.25)
        psnr = float(M.psnr_from_mse(jnp.asarray(mse)))
        assert psnr == pytest.approx(-10 / np.log(10) * np.log(0.25))

    def test_masked_mse_ignores_outside(self):
        pred = jnp.zeros((1, 8, 8, 3))
        gt = np.zeros((1, 8, 8, 3), np.float32)
        gt[:, :4] = 1.0  # error only in the top half
        mask = np.zeros((1, 8, 8, 1), np.float32)
        mask[:, 4:] = 1.0  # mask covers only the bottom half
        mse = float(M.masked_mse(pred, jnp.asarray(gt), jnp.asarray(mask))[0])
        assert mse == pytest.approx(0.0)

    def test_ssim_identity(self):
        img = jnp.asarray(np.random.RandomState(0).rand(32, 32, 3),
                          jnp.float32)
        assert float(M.ssim(img, img)) == pytest.approx(1.0, abs=1e-5)

    def test_ssim_degrades_with_noise(self):
        rng = np.random.RandomState(0)
        img = jnp.asarray(rng.rand(32, 32, 3), jnp.float32)
        noisy = img + jnp.asarray(rng.randn(32, 32, 3) * 0.2, jnp.float32)
        s = float(M.ssim(img, jnp.clip(noisy, 0, 1)))
        assert 0.0 < s < 0.95

    def test_ssim_matches_known_value(self):
        """Constant-shift SSIM has a closed form via the luminance term."""
        img = jnp.ones((16, 16, 3)) * 0.4
        shifted = img + 0.2
        # variance terms are 0 -> SSIM = (2 u1 u2 + C1)(C2)/((u1^2+u2^2+C1)C2)
        C1 = 0.01 ** 2
        expected = (2 * 0.4 * 0.6 + C1) / (0.4 ** 2 + 0.6 ** 2 + C1)
        assert float(M.ssim(img, shifted)) == pytest.approx(expected,
                                                            rel=1e-4)

    def test_lpips_structure(self):
        fn = M.make_lpips()
        a = jnp.zeros((2, 64, 64, 3))
        b = jnp.ones((2, 64, 64, 3)) * 0.5
        d_same = np.asarray(fn(a, a))
        d_diff = np.asarray(fn(a, b))
        assert d_same.shape == (2,)
        np.testing.assert_allclose(d_same, 0.0, atol=1e-6)
        assert (d_diff > 0).all()


class TestSingleHeadAttention:
    def test_chunked_matches_full(self):
        """ops/attention.single_head_attention: q-chunking is exact."""
        import jax
        import jax.numpy as jnp
        from view_neti_tpu.ops.attention import single_head_attention
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.normal(size=(2, 37, 16)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(2, 37, 16)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(2, 37, 16)).astype(np.float32))
        full = np.asarray(single_head_attention(q, k, v, chunk=64))
        chunked = np.asarray(single_head_attention(q, k, v, chunk=8))
        np.testing.assert_allclose(chunked, full, atol=1e-5)

"""Denoise-LOOP integration golden vs the torch mirror stack.

The per-component goldens (test_unet_vae_torch_golden.py,
test_clip_torch_golden.py) pin single forwards. This pins the whole
inference loop JOINTLY: our ONE-jit lax.fori_loop with the CFG pair fused
into the batch dim (view_neti_tpu/inference/pipeline.py:47-94) against a
loop structured like the REFERENCE's (/root/reference/sd_pipeline_call.py
:71-101: python loop, TWO sequential UNet calls per step — uncond then
cond), driving the independent torch MirrorUNet, with DPM-Solver++(2M)
re-derived in numpy inside this test. A bug in CFG ordering, the
cam-major context repeat, fori_loop coefficient indexing, x0_prev
threading, or the lower_order_final gate shows up here and nowhere else.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from view_neti_tpu import weight_port as wp  # noqa: E402
from view_neti_tpu.inference.pipeline import make_denoise_fn  # noqa: E402
from view_neti_tpu.models.unet import (UNetConfig,  # noqa: E402
                                       UNet2DCondition)
from view_neti_tpu.schedulers.dpm_solver import \
    DPMSolverSchedule  # noqa: E402

from torch_mirror_sd import MirrorUNet  # noqa: E402

BLOCK_OUT = (8, 16, 16, 16)
CTX_DIM = 8
HEADS = 2
GROUPS = 4
L = 5                       # prompt length
HW = 8                      # latent side


@pytest.fixture(scope="module")
def unet_pair():
    torch.manual_seed(11)
    mirror = MirrorUNet(block_out=BLOCK_OUT, ctx_dim=CTX_DIM, heads=HEADS,
                        groups=GROUPS).eval()
    sd = {k: v.numpy() for k, v in mirror.state_dict().items()}
    report = wp.PortReport("unet")
    params = wp.port_unet(sd, report=report)
    assert report.clean, report.summary()
    cfg = UNetConfig(block_out_channels=BLOCK_OUT,
                     cross_attention_dim=CTX_DIM,
                     num_attention_heads=HEADS, norm_groups=GROUPS,
                     use_flash_attention=False)
    return mirror, cfg, params


def _np_dpmpp_schedule(n_steps, n_train=1000, b0=0.00085, b1=0.012):
    """Schedule constants re-derived from the published definitions
    (scaled_linear betas; diffusers linspace timestep spacing) — written
    independently of schedulers/dpm_solver.py on purpose."""
    betas = np.linspace(b0 ** 0.5, b1 ** 0.5, n_train,
                        dtype=np.float64) ** 2
    acp = np.cumprod(1.0 - betas)
    ts = np.linspace(0, n_train - 1, n_steps + 1).round()[::-1][:-1]
    ts = ts.astype(np.int64)
    idx = np.concatenate([ts, [0]])
    alpha = np.sqrt(acp[idx]).astype(np.float32)
    sigma = np.sqrt(1.0 - acp[idx]).astype(np.float32)
    sigma = np.maximum(sigma, 1e-12).astype(np.float32)
    lam = (np.log(alpha.astype(np.float64))
           - np.log(sigma.astype(np.float64))).astype(np.float32)
    return ts, alpha, sigma, lam


def _torch_reference_loop(mirror, lat0, ctxs, uncond, n_steps,
                          guidance, prediction_type="epsilon",
                          lower_order_final=True):
    """Reference-structured loop: python for, sequential uncond/cond UNet
    calls, numpy DPM-Solver++(2M) multistep update."""
    ts, alpha, sigma, lam = _np_dpmpp_schedule(n_steps)
    N = lat0.shape[0]
    lat = lat0.astype(np.float32)          # NHWC
    x0_prev = None
    unc_list = [np.broadcast_to(uncond, (N,) + uncond.shape[1:])
                for _ in range(16)]
    for i in range(n_steps):
        t = torch.full((N,), float(ts[i]))
        x_t = torch.from_numpy(
            np.ascontiguousarray(lat.transpose(0, 3, 1, 2)))
        with torch.no_grad():
            if guidance > 1.0:
                eps_u = mirror(x_t, t,
                               [torch.from_numpy(np.ascontiguousarray(c))
                                for c in unc_list])
                eps_c = mirror(x_t, t,
                               [torch.from_numpy(c) for c in ctxs[i]])
                eps = eps_u + guidance * (eps_c - eps_u)
            else:
                eps = mirror(x_t, t, [torch.from_numpy(c)
                                      for c in ctxs[i]])
        eps = eps.numpy().transpose(0, 2, 3, 1)
        if prediction_type == "epsilon":
            x0 = (lat - sigma[i] * eps) / alpha[i]
        else:                               # v_prediction
            x0 = alpha[i] * lat - sigma[i] * eps
        h = lam[i + 1] - lam[i]
        first_order = (i == 0 or (lower_order_final and n_steps < 15
                                  and i == n_steps - 1))
        if first_order:
            lat = (sigma[i + 1] / sigma[i]) * lat \
                - alpha[i + 1] * (np.exp(-h) - 1.0) * x0
        else:
            h0 = lam[i] - lam[i - 1]
            r0 = h0 / h
            d1 = (x0 - x0_prev) / r0
            lat = (sigma[i + 1] / sigma[i]) * lat \
                - alpha[i + 1] * (np.exp(-h) - 1.0) * (x0 + 0.5 * d1)
        lat = lat.astype(np.float32)
        x0_prev = x0
    return lat


def _run_ours(cfg, params, lat0, ctxs, uncond, n_steps, guidance,
              prediction_type="epsilon"):
    schedule = DPMSolverSchedule(prediction_type=prediction_type)
    unet = UNet2DCondition(cfg)
    fn = make_denoise_fn(unet, None, schedule, n_steps,
                         guidance_scale=guidance)
    # (T, 16, 1, L, D): one prompt, N seeds -> reps = N inside the loop
    ctx = jnp.asarray(ctxs)[:, :, :1]
    return np.asarray(fn(jnp.asarray(lat0), {"params": params}, ctx, ctx,
                         jnp.asarray(uncond)))


def _inputs(seed, n_steps, N=2):
    rng = np.random.RandomState(seed)
    lat0 = rng.randn(N, HW, HW, 4).astype(np.float32)
    # per-timestep contexts, identical across the seed batch (the pipeline
    # repeats the single prompt's context over seeds — cam-major layout)
    base = rng.randn(n_steps, 16, 1, L, CTX_DIM).astype(np.float32)
    ctxs = np.broadcast_to(base, (n_steps, 16, N, L, CTX_DIM)).copy()
    uncond = rng.randn(1, L, CTX_DIM).astype(np.float32)
    return lat0, ctxs, uncond


class TestDenoiseLoopParity:
    def test_cfg_loop_matches_reference_structure(self, unet_pair):
        """5 steps, CFG 7.5 — also exercises the lower_order_final
        first-order fallback at the last step (n < 15)."""
        mirror, cfg, params = unet_pair
        lat0, ctxs, uncond = _inputs(0, n_steps=5)
        ref = _torch_reference_loop(mirror, lat0, ctxs, uncond, 5, 7.5)
        ours = _run_ours(cfg, params, lat0, ctxs, uncond, 5, 7.5)
        np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-3)

    def test_no_cfg_loop(self, unet_pair):
        mirror, cfg, params = unet_pair
        lat0, ctxs, uncond = _inputs(1, n_steps=4)
        ref = _torch_reference_loop(mirror, lat0, ctxs, uncond, 4, 1.0)
        ours = _run_ours(cfg, params, lat0, ctxs, uncond, 4, 1.0)
        np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-3)

    def test_v_prediction_loop(self, unet_pair):
        mirror, cfg, params = unet_pair
        lat0, ctxs, uncond = _inputs(2, n_steps=4)
        ref = _torch_reference_loop(mirror, lat0, ctxs, uncond, 4, 1.0,
                                    prediction_type="v_prediction")
        ours = _run_ours(cfg, params, lat0, ctxs, uncond, 4, 1.0,
                         prediction_type="v_prediction")
        np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-3)

    def test_harness_has_teeth(self, unet_pair):
        """Scrambling the per-timestep context ORDER must break parity —
        proves the loop comparison is sensitive to step indexing."""
        mirror, cfg, params = unet_pair
        lat0, ctxs, uncond = _inputs(3, n_steps=5)
        ref = _torch_reference_loop(mirror, lat0, ctxs, uncond, 5, 7.5)
        ours = _run_ours(cfg, params, lat0, ctxs[::-1].copy(), uncond,
                         5, 7.5)
        assert not np.allclose(ours, ref, atol=1e-3)

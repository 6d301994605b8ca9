#!/usr/bin/env python
"""Turnkey acceptance run: the BASELINE.md quality protocol in ONE command.

Given real assets, this trains the mode-2 single-scene recipe (DTU
scan114, dtu_subset 6, 3000 steps — reference README mode-2 command) and
then runs the reference's offline eval protocol — the full 34-view sweep,
masked MSE/PSNR/SSIM/LPIPS at 300x400 (reference
training/inference_dtu.py:469-651) — and emits the metric table. The
acceptance criterion (BASELINE.md: val LPIPS within 1% of the CUDA
reference) is checked when --reference_lpips is supplied.

Assets (all optional — missing ones degrade to random weights and the
run is labeled NOT meaningful for quality):
  SD_WEIGHTS_DIR      diffusers-layout SD-1.5 dir (weight_port.py)
  TOKENIZER_PATH      dir with vocab.json/merges.txt (real CLIP BPE)
  LPIPS_WEIGHTS       .npz from tools/export_lpips.py
  DTU_MASKS_DIR       RegNeRF idr masks root
  WEIGHTS_MANIFEST    optional sha256 manifest (tools/weights_manifest.py);
                      defaults to $SD_WEIGHTS_DIR/MANIFEST.sha256 if present

Usage:
  python tools/acceptance.py --dtu_root /data/dtu --out outputs/acceptance \
      [--scan scan114] [--steps 3000] [--seeds 0 1 2] \
      [--reference_lpips 0.XXX]
  python tools/acceptance.py --smoke --out /tmp/acc   # synthetic end-to-end

--smoke exercises the ENTIRE path (train -> checkpoint -> 34-view eval ->
table) with a tiny arch + synthetic DTU on CPU in ~2 min, so the harness
is proven runnable before real assets exist.
"""
import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np  # noqa: E402


def _asset_report(args):
    """Print which real assets are present; returns (report, all_real)."""
    assets = {
        "SD_WEIGHTS_DIR": os.environ.get("SD_WEIGHTS_DIR"),
        "TOKENIZER_PATH": os.environ.get("TOKENIZER_PATH"),
        "LPIPS_WEIGHTS": os.environ.get("LPIPS_WEIGHTS"),
        "DTU_MASKS_DIR": os.environ.get("DTU_MASKS_DIR"),
        "dtu_root": str(args.dtu_root) if args.dtu_root else None,
    }
    report = {}
    for name, path in assets.items():
        ok = bool(path) and Path(path).exists()
        report[name] = {"path": path, "present": ok}
        print(f"  {name:16s} {'OK   ' if ok else 'MISS '} {path or '-'}")
    all_real = all(v["present"] for v in report.values())
    if not all_real:
        print("  -> some assets missing: run completes but quality numbers"
              " are NOT meaningful (random weights / white masks)")
    return report, all_real


def _check_manifest():
    from view_neti_tpu.weight_port import check_manifest
    root = os.environ.get("SD_WEIGHTS_DIR")
    manifest = os.environ.get("WEIGHTS_MANIFEST")
    if not manifest and root and (Path(root) / "MANIFEST.sha256").exists():
        manifest = str(Path(root) / "MANIFEST.sha256")
    if not (manifest and root):
        return None
    problems = check_manifest(Path(root), Path(manifest))
    if problems:
        raise SystemExit("weights manifest verification FAILED:\n  "
                         + "\n  ".join(problems))
    print(f"  manifest OK: {manifest}")
    return manifest


def _make_smoke_dtu(root: Path):
    """Synthetic DTU tree covering every eval camera (as the test suite's
    miniature fixtures do)."""
    from PIL import Image
    from view_neti_tpu.training import inference_dtu
    rng = np.random.RandomState(0)
    cal = root / "Calibration" / "cal18"
    cal.mkdir(parents=True, exist_ok=True)
    for i in range(1, 65):
        m = rng.randn(3, 4) * 100
        (cal / f"pos_{i:03d}.txt").write_text(
            "\n".join(" ".join(f"{x:.4f}" for x in r) for r in m))
    scan = root / "Rectified" / "scan114"
    scan.mkdir(parents=True, exist_ok=True)
    cam_idxs, cam_idxs_train, _ = inference_dtu.get_cam_idxs(6)
    for i in sorted(set(cam_idxs) | set(cam_idxs_train)):
        Image.fromarray(rng.randint(0, 255, (48, 64, 3), np.uint8)
                        ).save(scan / f"rect_{i + 1:03d}_3_r5000.png")
    return root


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtu_root", type=Path, default=None,
                    help="dir containing Rectified/ + Calibration/cal18/")
    ap.add_argument("--scan", default="scan114")
    ap.add_argument("--out", type=Path, required=True)
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--dtu_subset", type=int, default=6)
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    ap.add_argument("--denoise_steps", type=int, default=30)
    ap.add_argument("--reference_lpips", type=float, default=None,
                    help="reference run's lpips_test_mean; checks the "
                         "within-1%% acceptance criterion")
    ap.add_argument("--smoke", action="store_true",
                    help="synthetic DTU + tiny arch on CPU: proves the "
                         "harness end-to-end without real assets")
    args = ap.parse_args()

    print("== acceptance assets ==")
    if args.smoke:
        os.environ.setdefault("VIEW_NETI_TINY", "1")
        args.dtu_root = _make_smoke_dtu(args.out / "smoke_dtu")
        args.steps = min(args.steps, 2)
        args.denoise_steps = min(args.denoise_steps, 2)
        args.seeds = args.seeds[:1]
    report, all_real = _asset_report(args)
    manifest = _check_manifest()
    if args.dtu_root is None:
        raise SystemExit("--dtu_root is required (or --smoke)")

    import jax
    tiny = bool(os.environ.get("VIEW_NETI_TINY"))
    if tiny:
        jax.config.update("jax_default_device", jax.devices("cpu")[0])
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    else:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/jax_compile"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from view_neti_tpu.config import RunConfig, decode
    from view_neti_tpu.training import builder
    from view_neti_tpu.training.coach import Coach
    from view_neti_tpu.training.validate import ValidationHandler

    scan_dir = Path(args.dtu_root) / "Rectified" / args.scan
    cal_dir = Path(args.dtu_root) / "Calibration" / "cal18"
    # The mode-2 single-scene recipe (reference README + train.yaml optim
    # block), on the SD-1.5 / 768-D family BASELINE.md names.
    cfg = decode(RunConfig, {
        "learnable_mode": 2,
        "model": {"arch_view_net": 15, "arch_view_disable_tl": False,
                  "word_embedding_dim": 768,
                  "pretrained_model_name_or_path":
                      "runwayml/stable-diffusion-v1-5",
                  "normalize_view_mapper_output": True,
                  "output_bypass_alpha_view": 5.0,
                  "pe_sigma_exp_key": 2},
        "data": {"train_data_dir": str(scan_dir),
                 "camera_representation": "dtu-12d",
                 "dtu_subset": args.dtu_subset,
                 "dtu_preprocess_key": -1 if tiny else 1,
                 "augmentation_key": 7, "repeats": 100,
                 "placeholder_object_token": "<skull>",
                 **({"resolution": 16} if tiny else {}),
                 **({"tokenizer_path": os.environ["TOKENIZER_PATH"]}
                    if os.environ.get("TOKENIZER_PATH") else {})},
        "log": {"exp_dir": str(args.out / "run"), "overwrite_ok": True,
                "save_dataset_images": False, "save_steps": args.steps},
        "eval": {"validation_prompts": None,
                 "validation_seeds": list(args.seeds),
                 "num_validation_images": len(args.seeds)},
        "optim": {"mixed_precision": "no" if tiny else "bf16",
                  "max_train_steps": args.steps,
                  "train_batch_size": 2 if tiny else 3,
                  "gradient_accumulation_steps": 1 if tiny else 3},
    })
    arch = builder.tiny_arch() if tiny else None
    if tiny:
        cfg.model.word_embedding_dim = arch.text.hidden_size

    lpips_fn = None
    lpips_weights = os.environ.get("LPIPS_WEIGHTS")
    from view_neti_tpu.ops.metrics import make_lpips
    if not lpips_weights:
        print("warn: LPIPS with RANDOM VGG weights (relative numbers "
              "only)", file=sys.stderr)
    lpips_fn = make_lpips(lpips_weights)

    print(f"== training {args.steps} steps (mode 2, {args.scan}, "
          f"subset {args.dtu_subset}) ==")
    t0 = time.time()
    coach = Coach(cfg, arch=arch, calibration_dir=str(cal_dir),
                  weights_dir=os.environ.get("SD_WEIGHTS_DIR"))
    coach.train()
    train_wall = time.time() - t0

    print(f"== eval: {args.denoise_steps}-step DPM++ 34-view sweep, "
          f"{len(args.seeds)} seeds ==")
    t0 = time.time()
    validator = ValidationHandler(
        cfg, masks_root=os.environ.get("DTU_MASKS_DIR"),
        calibration_dir=str(cal_dir), lpips_fn=lpips_fn)
    results = validator.infer_dtu(
        coach, coach.trainable, step=args.steps,
        num_steps=args.denoise_steps, return_instead_of_save=True,
        on_missing_ckpt="raise")
    eval_wall = time.time() - t0

    metrics = {k: float(v) for k, v in results.items()
               if k.endswith("_mean")}
    print("== results (masked, 300x400 protocol) ==")
    print(f"  {'metric':8s} {'train views':>12s} {'test views':>12s}")
    for m in ("mse", "psnr", "ssim", "lpips"):
        print(f"  {m:8s} {metrics[f'{m}_train_mean']:12.4f} "
              f"{metrics[f'{m}_test_mean']:12.4f}")

    verdict = None
    if args.reference_lpips is not None:
        got = metrics["lpips_test_mean"]
        rel = abs(got - args.reference_lpips) / max(args.reference_lpips,
                                                    1e-9)
        verdict = {"lpips_test_mean": got,
                   "reference": args.reference_lpips,
                   "rel_diff": rel, "pass": bool(rel <= 0.01)}
        print(f"== acceptance: lpips {got:.4f} vs reference "
              f"{args.reference_lpips:.4f} -> rel diff {rel:.2%} "
              f"[{'PASS' if verdict['pass'] else 'FAIL'}]")

    args.out.mkdir(parents=True, exist_ok=True)
    payload = {"metrics": metrics, "assets": report,
               "manifest": manifest, "all_assets_real": all_real,
               "meaningful_for_quality": all_real,
               "train_wall_s": round(train_wall, 1),
               "eval_wall_s": round(eval_wall, 1),
               "steps": args.steps, "seeds": args.seeds,
               "denoise_steps": args.denoise_steps,
               "acceptance": verdict}
    (args.out / "acceptance.json").write_text(json.dumps(payload, indent=2))
    print("wrote", args.out / "acceptance.json")
    if verdict is not None and not verdict["pass"]:
        raise SystemExit(2)


if __name__ == "__main__":
    main()

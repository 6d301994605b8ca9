"""Acceptance harness + weights manifest (VERDICT r3 missing #2 / next #4):
the quality protocol must be ONE runnable command once assets exist, and
its asset pinning must detect tampering."""
import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]


class TestWeightsManifest:
    @pytest.mark.quick
    def test_write_check_tamper(self, tmp_path):
        from view_neti_tpu.weight_port import check_manifest, write_manifest
        root = tmp_path / "weights"
        (root / "unet").mkdir(parents=True)
        (root / "unet" / "diffusion_pytorch_model.bin").write_bytes(
            os.urandom(512))
        (root / "vocab.json").write_text("{}")
        manifest = root / "MANIFEST.sha256"
        n = write_manifest(root, manifest)
        assert n == 2
        assert check_manifest(root, manifest) == []
        (root / "vocab.json").write_text("{tampered}")
        problems = check_manifest(root, manifest)
        assert problems and "vocab.json" in problems[0]
        (root / "unet" / "diffusion_pytorch_model.bin").unlink()
        assert any("missing" in p for p in check_manifest(root, manifest))


class TestAcceptanceSmoke:
    def test_smoke_runs_full_protocol(self, tmp_path):
        """--smoke must execute train -> step-N checkpoint -> 34-view
        masked eval -> metric table -> acceptance.json on CPU with no
        real assets."""
        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env.pop("SD_WEIGHTS_DIR", None)
        env.pop("LPIPS_WEIGHTS", None)
        env["JAX_PLATFORMS"] = "cpu"
        out = subprocess.run(
            [sys.executable, str(REPO / "tools" / "acceptance.py"),
             "--smoke", "--out", str(tmp_path)],
            env=env, capture_output=True, text=True, timeout=1500,
            cwd=str(REPO))
        assert out.returncode == 0, (out.stdout[-2000:], out.stderr[-2000:])
        payload = json.loads((tmp_path / "acceptance.json").read_text())
        # FULL schema pin (r4 verdict item 8): the one-command quality run
        # must not rot before real assets arrive; any key drift here would
        # silently break the day-one acceptance run
        assert set(payload) == {
            "metrics", "assets", "manifest", "all_assets_real",
            "meaningful_for_quality", "train_wall_s", "eval_wall_s",
            "steps", "seeds", "denoise_steps", "acceptance"}, set(payload)
        for m in ("mse", "psnr", "ssim", "lpips"):
            for split in ("train", "test"):
                v = payload["metrics"][f"{m}_{split}_mean"]
                assert np.isfinite(v), (m, split, v)
        for name in ("SD_WEIGHTS_DIR", "TOKENIZER_PATH", "LPIPS_WEIGHTS",
                     "DTU_MASKS_DIR", "dtu_root"):
            assert set(payload["assets"][name]) == {"path", "present"}
        assert payload["train_wall_s"] > 0 and payload["eval_wall_s"] > 0
        assert payload["steps"] >= 1 and len(payload["seeds"]) >= 1
        # random-weights runs must be labeled as not quality-meaningful
        assert payload["all_assets_real"] is False
        assert payload["meaningful_for_quality"] is False
        assert payload["acceptance"] is None

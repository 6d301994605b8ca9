#!/usr/bin/env python
"""sha256-pin ported weight files (VERDICT r3 item 4).

The acceptance protocol's quality claim depends on scoring the EXACT
ported artifacts (SD weights, LPIPS VGG npz, tokenizer vocab); this tool
writes/verifies a 'sha256  bytes  relpath' manifest over them.
tools/acceptance.py auto-verifies $SD_WEIGHTS_DIR/MANIFEST.sha256 (or
$WEIGHTS_MANIFEST) before every run.

Usage:
  python tools/weights_manifest.py write --root $SD_WEIGHTS_DIR \
      [--extra $LPIPS_WEIGHTS vocab.json ...] [--out MANIFEST.sha256]
  python tools/weights_manifest.py check --root $SD_WEIGHTS_DIR \
      [--manifest MANIFEST.sha256]
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from view_neti_tpu.weight_port import check_manifest, write_manifest


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    w = sub.add_parser("write")
    w.add_argument("--root", type=Path, required=True)
    w.add_argument("--extra", nargs="*", default=[])
    w.add_argument("--out", type=Path, default=None)
    c = sub.add_parser("check")
    c.add_argument("--root", type=Path, required=True)
    c.add_argument("--manifest", type=Path, default=None)
    args = ap.parse_args()

    if args.cmd == "write":
        out = args.out or args.root / "MANIFEST.sha256"
        n = write_manifest(args.root, out, tuple(args.extra))
        print(f"wrote {out} ({n} files)")
    else:
        manifest = args.manifest or args.root / "MANIFEST.sha256"
        problems = check_manifest(args.root, manifest)
        if problems:
            print("FAILED:\n  " + "\n  ".join(problems))
            raise SystemExit(1)
        print("OK")


if __name__ == "__main__":
    main()

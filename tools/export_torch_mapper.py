#!/usr/bin/env python
"""Convert this framework's checkpoints to the reference's torch formats.

The reverse of tools/import_torch_mapper.py: a mapper trained HERE is
written as ``mapper-steps-N_{view,object}.pt`` / ``learned_embeds-*.bin``
shaped exactly like the reference CheckpointHandler's own output
(reference checkpoint_handler.py:40-97) — pickled encoder module, strict
state_dict key set, reference-surface config — so the published ViewNeTI
tooling (its scripts/inference.py, summarize_dtu.py, modes 4/5 reuse) can
consume it unchanged.

Usage:
  python tools/export_torch_mapper.py --out outputs/exported \
      --view results/exp/mapper-steps-3000_view.msgpack \
      [--object results/exp/mapper-steps-3000_object.msgpack] \
      [--embeds results/exp/learned_embeds-steps-3000.msgpack] \
      [--iteration 3000]
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=Path, required=True)
    ap.add_argument("--view", type=Path, default=None,
                    help="mapper-steps-N_view.msgpack")
    ap.add_argument("--object", dest="object_", type=Path, default=None,
                    help="mapper-steps-N_object.msgpack")
    ap.add_argument("--embeds", type=Path, default=None,
                    help="learned_embeds-steps-N.msgpack")
    ap.add_argument("--iteration", type=int, default=None,
                    help="step number for output names (default: parsed "
                         "from the input filenames)")
    args = ap.parse_args()
    if not (args.view or args.object_ or args.embeds):
        ap.error("nothing to export: pass --view/--object/--embeds")

    from view_neti_tpu.torch_interop import export_torch_artifacts
    written = export_torch_artifacts(
        args.out, view_path=args.view, object_path=args.object_,
        embeds_path=args.embeds, iteration=args.iteration)
    for p in written:
        print("wrote", p)


if __name__ == "__main__":
    main()

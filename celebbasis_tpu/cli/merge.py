"""Merge textual-inversion embedding checkpoints (``merge_embeddings.py``).

Combines multiple TI managers into one; collisions must be renamed with
``--rename old.pt:placeholder=new_name`` (the reference prompts
interactively; a CLI flag is the non-interactive equivalent).
"""
from __future__ import annotations

import argparse

import numpy as np

from celebbasis_tpu.core import textual_inversion as ti
from celebbasis_tpu.utils.pt_io import save_pt


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--manager_ckpts", type=str, nargs="+", required=True)
    p.add_argument("--output_path", type=str, required=True)
    p.add_argument("--rename", type=str, nargs="*", default=[],
                   help="entries 'path:placeholder=newname'")
    args = p.parse_args(argv)

    rename = {}
    for item in args.rename:
        key, new = item.split("=", 1)
        rename[key] = new
    merged = ti.merge_ti_checkpoints(args.manager_ckpts, rename)
    save_pt({
        "string_to_token": {k: np.int64(0) for k in merged},
        "string_to_param": {k: v.astype(np.float32)
                            for k, v in merged.items()},
    }, args.output_path)
    print(f"[merge] wrote {len(merged)} placeholders to {args.output_path}: "
          f"{sorted(merged)}")


if __name__ == "__main__":
    main()

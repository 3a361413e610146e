"""Celeb-basis builder CLI (W1) — precompute and export the PCA basis.

The reference recomputes the basis inside every model load
(`FrozenCLIPEmbedder.__init__`, modules.py:451); here it is an explicit,
cached stage with a ``save_celeb_embeddings``-equivalent export
(modules.py:626-631).
"""
from __future__ import annotations

import argparse

import numpy as np

from celebbasis_tpu.core import basis as basis_mod
from celebbasis_tpu.loader import assemble
from celebbasis_tpu.utils.config import load_run_spec


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", type=str, nargs="+",
                   default=["configs/aigc_id.yaml"])
    p.add_argument("--celeb_txt", type=str, default=None,
                   help="override the config's names file")
    p.add_argument("--ckpt", type=str, default=None,
                   help="sd checkpoint (for the real token table)")
    p.add_argument("--out", type=str, default="weights/celeb_basis.pt")
    p.add_argument("--vocab", type=str, default=None)
    args = p.parse_args(argv)

    spec = load_run_spec(args.config)
    if args.celeb_txt:
        spec.celeb_txt = args.celeb_txt
    asm = assemble(spec, sd_ckpt=args.ckpt, vocab_path=args.vocab)
    basis = np.asarray(asm.basis)
    basis_mod.save_basis_pt(basis, args.out)
    print(f"[build_basis] {basis.shape} basis "
          f"(mean+{basis.shape[1]-1} dirs x {basis.shape[0]} columns) "
          f"-> {args.out}")


if __name__ == "__main__":
    main()

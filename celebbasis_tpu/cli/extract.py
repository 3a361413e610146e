"""Extraction CLI — the reference's ``scripts/extract_pt.py`` (03_extract.sh).

Loads a trained ``embeddings_gs-*.pt``, reconstructs each identity's final
text embedding ``z = coeff · P + mean`` against the celeb basis, and exports
the textual-inversion-compatible artifacts (extract_pt.py:95-140):

* ``celeb_basis.pt``           — the (es, 1+inner, 768) basis tensor;
* ``id_embedding_{i}.pt``      — per-identity (es*h, 768) embeddings;
* ``id_coefficient_{i}.pt``    — per-identity (es, h, inner) coefficients.
"""
from __future__ import annotations

import argparse
import os

import numpy as np

from celebbasis_tpu.core import basis as basis_mod
from celebbasis_tpu.core import manager as mgr
from celebbasis_tpu.loader import assemble, manager_config_from_spec
from celebbasis_tpu.utils.config import load_run_spec
from celebbasis_tpu.utils.pt_io import save_pt


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", type=str, nargs="+",
                   default=["configs/aigc_id.yaml"])
    p.add_argument("--embedding_path", type=str, required=True)
    p.add_argument("--outdir", type=str, default="weights/ti_id_embeddings")
    p.add_argument("--vocab", type=str, default=None)
    args = p.parse_args(argv)

    spec = load_run_spec(args.config)
    asm = assemble(spec, vocab_path=args.vocab,
                   embedding_ckpt=args.embedding_path)
    m_cfg = asm.pipeline.manager_cfg
    basis = np.asarray(asm.basis)

    os.makedirs(args.outdir, exist_ok=True)
    basis_mod.save_basis_pt(basis, os.path.join(args.outdir, "celeb_basis.pt"))
    coeffs = np.asarray(asm.manager_state.id_coefficients)
    for i in range(m_cfg.max_ids):
        z = basis_mod.reconstruct(coeffs[i], basis)
        save_pt(z.astype(np.float32),
                os.path.join(args.outdir, f"id_embedding_{i}.pt"))
        save_pt(coeffs[i].astype(np.float32),
                os.path.join(args.outdir, f"id_coefficient_{i}.pt"))
    print(f"[extract] wrote celeb_basis.pt + {m_cfg.max_ids} id embeddings/"
          f"coefficients to {args.outdir}")


if __name__ == "__main__":
    main()

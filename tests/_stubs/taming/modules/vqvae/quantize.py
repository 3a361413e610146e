"""state_dict-compatible stand-in for taming's VectorQuantizer2: only the
codebook parameter (``embedding.weight``, the single taming leaf inside a
VQModel checkpoint) matters for the bridge/structural tests."""
import torch.nn as nn


class VectorQuantizer2(nn.Module):
    def __init__(self, n_e, e_dim, beta=0.25, remap=None,
                 unknown_index="random", sane_index_shape=False,
                 legacy=True):
        super().__init__()
        self.n_e, self.e_dim, self.beta = n_e, e_dim, beta
        self.embedding = nn.Embedding(n_e, e_dim)

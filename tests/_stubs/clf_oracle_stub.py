"""Null personalization target for reference-LatentDiffusion construction in
oracles that never touch conditioning (e.g. the classifier trajectory
oracle): the fork's LatentDiffusion ctor REQUIRES a personalization_config
(ddpm.py:444,502-506) even for unconditional models, and the real managers
need a CLIP/BERT embedder.  This no-param module satisfies the ctor's
embedding_parameters()/trainable_parameters() loops and nothing else."""
import torch.nn as nn


class NullManager(nn.Module):
    def __init__(self, embedder=None, **kw):
        super().__init__()

    def embedding_parameters(self):
        return []

    def trainable_parameters(self):
        return []

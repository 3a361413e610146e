"""Minimal pytorch_lightning stub — lets the reference's Lightning-based
modules (ldm/models/autoencoder.py etc.) import for golden/structural tests
in this Lightning-free image.  Only the surface touched at import/__init__
time is provided."""
import torch.nn as nn


class LightningModule(nn.Module):
    def save_hyperparameters(self, *a, **k):
        pass

    def log(self, *a, **k):
        pass

    def log_dict(self, *a, **k):
        pass

"""Minimal pytorch_lightning stub — lets the reference's Lightning-based
modules (ldm/models/autoencoder.py etc.) import for golden/structural tests
in this Lightning-free image.  Only the surface touched at import/__init__
time is provided."""
import torch
import torch.nn as nn


class LightningModule(nn.Module):
    global_step = 0      # trainer-backed in real PL; fixed here
    current_epoch = 0

    @property
    def device(self):
        try:
            return next(self.parameters()).device
        except StopIteration:
            return torch.device("cpu")

    def save_hyperparameters(self, *a, **k):
        pass

    def log(self, *a, **k):
        pass

    def log_dict(self, *a, **k):
        pass

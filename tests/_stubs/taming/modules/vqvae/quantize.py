"""state_dict-compatible stand-in for taming's VectorQuantizer2 with the
faithful forward (taming/modules/vqvae/quantize.py, legacy=True, no remap):
nearest-codebook argmin, straight-through estimator, and the two-term
commitment loss — so the reference's VQModel.training_step runs end-to-end
for the VQ trajectory oracle."""
import torch
import torch.nn as nn


class VectorQuantizer2(nn.Module):
    def __init__(self, n_e, e_dim, beta=0.25, remap=None,
                 unknown_index="random", sane_index_shape=False,
                 legacy=True):
        super().__init__()
        assert remap is None, "stub supports remap=None only"
        self.n_e, self.e_dim, self.beta = n_e, e_dim, beta
        self.legacy = legacy
        self.sane_index_shape = sane_index_shape
        self.embedding = nn.Embedding(n_e, e_dim)

    def forward(self, z, temp=None, rescale_logits=False,
                return_logits=False):
        z = z.permute(0, 2, 3, 1).contiguous()
        z_flat = z.view(-1, self.e_dim)
        d = (torch.sum(z_flat ** 2, dim=1, keepdim=True)
             + torch.sum(self.embedding.weight ** 2, dim=1)
             - 2 * z_flat @ self.embedding.weight.t())
        idx = torch.argmin(d, dim=1)
        z_q = self.embedding(idx).view(z.shape)
        if self.legacy:
            loss = (torch.mean((z_q.detach() - z) ** 2)
                    + self.beta * torch.mean((z_q - z.detach()) ** 2))
        else:
            loss = (self.beta * torch.mean((z_q.detach() - z) ** 2)
                    + torch.mean((z_q - z.detach()) ** 2))
        z_q = z + (z_q - z).detach()          # straight-through
        z_q = z_q.permute(0, 3, 1, 2).contiguous()
        if self.sane_index_shape:
            idx = idx.reshape(z_q.shape[0], z_q.shape[2], z_q.shape[3])
        return z_q, loss, (None, None, idx)

    def get_codebook_entry(self, indices, shape):
        z_q = self.embedding(indices)
        if shape is not None:
            z_q = z_q.view(shape).permute(0, 3, 1, 2).contiguous()
        return z_q

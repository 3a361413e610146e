"""Torch stand-ins for the taming-transformers loss building blocks that the
reference's ``ldm.modules.losses.contperceptual`` star-imports (taming is not
installed in this image).  Formulas/layouts follow the public taming code
(`taming/modules/losses/vqperceptual.py`, `.../losses/lpips.py`,
`.../discriminator/model.py`); the one deliberate delta is that ``LPIPS``
self-initializes randomly instead of downloading the pretrained VGG16 + lin
weights (no network here), with the lin heads made non-negative like the
shipped LPIPS weights — the trajectory oracles bridge whatever weights it
holds into our flax modules, so parity holds for any weights.
"""
import torch
import torch.nn as nn
import torch.nn.functional as F


# ---------------------------------------------------------------------------
# schedule / GAN helpers
# ---------------------------------------------------------------------------

def adopt_weight(weight, global_step, threshold=0, value=0.0):
    if global_step < threshold:
        weight = value
    return weight


def hinge_d_loss(logits_real, logits_fake):
    loss_real = torch.mean(F.relu(1.0 - logits_real))
    loss_fake = torch.mean(F.relu(1.0 + logits_fake))
    return 0.5 * (loss_real + loss_fake)


def vanilla_d_loss(logits_real, logits_fake):
    return 0.5 * (torch.mean(F.softplus(-logits_real))
                  + torch.mean(F.softplus(logits_fake)))


def weights_init(m):
    classname = m.__class__.__name__
    if classname.find("Conv") != -1:
        nn.init.normal_(m.weight.data, 0.0, 0.02)
    elif classname.find("BatchNorm") != -1:
        nn.init.normal_(m.weight.data, 1.0, 0.02)
        nn.init.constant_(m.bias.data, 0)


# ---------------------------------------------------------------------------
# PatchGAN discriminator (taming/modules/discriminator/model.py, BN flavor)
# ---------------------------------------------------------------------------

class NLayerDiscriminator(nn.Module):
    def __init__(self, input_nc=3, ndf=64, n_layers=3, use_actnorm=False):
        super().__init__()
        assert not use_actnorm, "stub supports the BatchNorm flavor only"
        kw, padw = 4, 1
        seq = [nn.Conv2d(input_nc, ndf, kw, 2, padw),
               nn.LeakyReLU(0.2, True)]
        nf_mult = 1
        for n in range(1, n_layers):
            prev, nf_mult = nf_mult, min(2 ** n, 8)
            seq += [nn.Conv2d(ndf * prev, ndf * nf_mult, kw, 2, padw,
                              bias=False),
                    nn.BatchNorm2d(ndf * nf_mult), nn.LeakyReLU(0.2, True)]
        prev, nf_mult = nf_mult, min(2 ** n_layers, 8)
        seq += [nn.Conv2d(ndf * prev, ndf * nf_mult, kw, 1, padw,
                          bias=False),
                nn.BatchNorm2d(ndf * nf_mult), nn.LeakyReLU(0.2, True),
                nn.Conv2d(ndf * nf_mult, 1, kw, 1, padw)]
        self.main = nn.Sequential(*seq)

    def forward(self, x):
        return self.main(x)


# ---------------------------------------------------------------------------
# LPIPS (taming/modules/losses/lpips.py), randomly initialized
# ---------------------------------------------------------------------------

_VGG_PLAN = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
             512, 512, 512, "M", 512, 512, 512)
_TAPS = (2, 4, 7, 10, 13)           # tap after the ReLU of these conv idx
_SHIFT = (-0.030, -0.088, -0.188)
_SCALE = (0.458, 0.448, 0.450)


class _NetLinLayer(nn.Module):
    def __init__(self, chn_in, use_dropout=True):
        super().__init__()
        layers = [nn.Dropout()] if use_dropout else []
        layers += [nn.Conv2d(chn_in, 1, 1, bias=False)]
        self.model = nn.Sequential(*layers)


class LPIPS(nn.Module):
    """Zhang LPIPS over torchvision-layout VGG16 ``features`` (so the
    state_dict feeds ``bridge.convert_vgg16`` / ``convert_lpips`` directly).
    eval() is expected (contperceptual constructs ``LPIPS().eval()``)."""

    def __init__(self, use_dropout=True):
        super().__init__()
        layers, in_c = [], 3
        for item in _VGG_PLAN:
            if item == "M":
                layers.append(nn.MaxPool2d(2, 2))
            else:
                layers += [nn.Conv2d(in_c, item, 3, padding=1), nn.ReLU()]
                in_c = item
        layers.append(nn.MaxPool2d(2, 2))
        self.features = nn.Sequential(*layers)
        self.chns = [64, 128, 256, 512, 512]
        self.lin0 = _NetLinLayer(64, use_dropout)
        self.lin1 = _NetLinLayer(128, use_dropout)
        self.lin2 = _NetLinLayer(256, use_dropout)
        self.lin3 = _NetLinLayer(512, use_dropout)
        self.lin4 = _NetLinLayer(512, use_dropout)
        with torch.no_grad():   # shipped LPIPS lin heads are non-negative
            for lin in (self.lin0, self.lin1, self.lin2, self.lin3,
                        self.lin4):
                lin.model[-1].weight.abs_()
        for p in self.parameters():
            p.requires_grad = False

    def _taps(self, x):
        feats, h, conv_i = [], x, 0
        for layer in self.features:
            h = layer(h)
            if isinstance(layer, nn.Conv2d):
                conv_i += 1
            if isinstance(layer, nn.ReLU) and conv_i in _TAPS:
                feats.append(h)
        return feats

    def forward(self, input, target):
        shift = torch.tensor(_SHIFT).view(1, 3, 1, 1)
        scale = torch.tensor(_SCALE).view(1, 3, 1, 1)
        lins = [self.lin0, self.lin1, self.lin2, self.lin3, self.lin4]
        val = 0
        for lin, a, b in zip(lins, self._taps((input - shift) / scale),
                             self._taps((target - shift) / scale)):
            # real taming normalize_tensor: eps OUTSIDE the sqrt
            na = a / (torch.sqrt(torch.sum(a ** 2, 1, keepdim=True)) + 1e-10)
            nb = b / (torch.sqrt(torch.sum(b ** 2, 1, keepdim=True)) + 1e-10)
            d = (na - nb) ** 2
            val = val + lin.model(d).mean((2, 3), keepdim=True)
        return val

"""Import path stand-in: the reference's ``ldm.modules.losses.vqperceptual``
imports ``NLayerDiscriminator``/``weights_init`` from here (taming's real
layout); the implementations live in our losses stub."""
from taming.modules.losses.vqperceptual import (NLayerDiscriminator,  # noqa: F401
                                                weights_init)

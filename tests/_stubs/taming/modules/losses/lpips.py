"""Import path stand-in: the reference's ``ldm.modules.losses.vqperceptual``
imports ``LPIPS`` from here (taming's real layout); the implementation lives
in our vqperceptual stub."""
from taming.modules.losses.vqperceptual import LPIPS  # noqa: F401

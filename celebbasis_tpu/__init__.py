"""celebbasis-tpu: TPU-native one-shot face personalization framework.

Env knobs:
  CELEBBASIS_PLATFORM=cpu|tpu|axon — force the JAX platform at import time
  (the image's sitecustomize pins ``jax_platforms=axon,cpu``, which wins over
  the standard JAX_PLATFORMS env var; this restores user control).
"""
import os as _os

_plat = _os.environ.get("CELEBBASIS_PLATFORM")
if _plat:
    import jax as _jax

    _jax.config.update("jax_platforms",
                       {"tpu": "axon"}.get(_plat, _plat))

__version__ = "0.1.0"

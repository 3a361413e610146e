"""Stub torchvision package (absent in this image) so the reference's
lib/networks.py module-level `import torchvision.models` succeeds.
Only the names PIPNet touches exist; backed by tests/_stubs/torch_resnet.py."""
from . import models  # noqa: F401
from . import transforms  # noqa: F401
from . import utils  # noqa: F401

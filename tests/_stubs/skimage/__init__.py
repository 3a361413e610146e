"""Stub skimage package (absent in this image) so the reference's
alignment/alignment.py `from skimage import transform as trans` works.
Only SimilarityTransform is implemented — see transform.py."""
from . import transform  # noqa: F401

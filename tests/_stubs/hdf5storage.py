"""hdf5storage stand-in: the reference's preprocess.py imports it for COFW/
AFLW .mat loading. scipy handles the v5 files our fixtures write."""
import scipy.io


def loadmat(path, **kw):
    return scipy.io.loadmat(path, **kw)

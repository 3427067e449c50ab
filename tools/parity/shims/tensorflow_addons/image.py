import numpy as np
import tensorflow as tf
from scipy import ndimage

def connected_components(images):
    def _cc(arr):
        arr = np.asarray(arr)
        if arr.ndim == 2:
            out, _ = ndimage.label(arr, structure=np.array(
                [[0, 1, 0], [1, 1, 1], [0, 1, 0]]))
            return out.astype(np.int32)
        return np.stack([_cc(a) for a in arr]).astype(np.int32)
    return tf.py_function(_cc, [images], tf.int32)

def gaussian_filter2d(*a, **k):
    raise NotImplementedError('shim: not needed without label smoothing')

def sparse_image_warp(*a, **k):
    raise NotImplementedError('shim: nowarp config expected')

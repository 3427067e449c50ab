from . import cca, filters, image, morphology, pooling, warp  # noqa: F401

from . import cca, filters, image, morphology, warp  # noqa: F401

from . import se3, sh, image, losses, knn, scan, sketch  # noqa: F401

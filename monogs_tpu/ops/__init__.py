from . import se3, sh, image, losses, knn, sketch  # noqa: F401

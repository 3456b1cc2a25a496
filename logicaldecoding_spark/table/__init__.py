from .format import LakeTable  # noqa: F401

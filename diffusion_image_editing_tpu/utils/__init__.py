from .constants import ATTRS, ATTR_DICT, ANY_GAN_ATTRS, ANY_GAN_ATTRS_DICT  # noqa: F401

from .transforms import array_to_pil, arrays_to_pils, pil_to_array  # noqa: F401
from .alignment import (  # noqa: F401
    align_face,
    align_quad,
    dlib_landmarker,
    landmarks_from_parsing,
    prepare_real_image_for_editing,
)
from .tokenizer import CLIPTokenizer  # noqa: F401

from .transforms import array_to_pil, arrays_to_pils, pil_to_array  # noqa: F401

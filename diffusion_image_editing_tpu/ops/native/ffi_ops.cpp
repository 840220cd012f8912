// XLA FFI custom calls (CPU platform) — the C++ native-op integration path.
//
// Registered into JAX via jax.ffi (see ops/native/__init__.py). The ops here
// serve the host-side stages of the pipeline (e.g. CelebAMask label merging
// inside a jitted input pipeline); device compute stays in Pallas/XLA.
//
// Build: g++ -O3 -shared -fPIC -I$(python -c 'import jax.ffi; print(jax.ffi.include_dir())')

#include <cstdint>
#include <cstring>

#include "xla/ffi/api/ffi.h"

namespace ffi = xla::ffi;

// label_merge: (P, N) uint8 part masks -> (N,) uint8 label map.
// Pixels equal to `marker` in part p get class id p+1; later parts win.
static ffi::Error LabelMergeImpl(ffi::Buffer<ffi::U8> parts,
                                 ffi::ResultBuffer<ffi::U8> out) {
  auto dims = parts.dimensions();
  if (dims.size() != 2) {
    return ffi::Error::InvalidArgument("parts must be rank-2 (P, N)");
  }
  const int64_t n_parts = dims[0];
  const int64_t npix = dims[1];
  const uint8_t marker = 225;
  uint8_t* dst = out->typed_data();
  const uint8_t* src = parts.typed_data();
  std::memset(dst, 0, npix);
  for (int64_t p = 0; p < n_parts; ++p) {
    const uint8_t* row = src + p * npix;
    const uint8_t cls = static_cast<uint8_t>(p + 1);
    for (int64_t i = 0; i < npix; ++i) {
      if (row[i] == marker) dst[i] = cls;
    }
  }
  return ffi::Error::Success();
}

XLA_FFI_DEFINE_HANDLER_SYMBOL(kLabelMerge, LabelMergeImpl,
                              ffi::Ffi::Bind()
                                  .Arg<ffi::Buffer<ffi::U8>>()
                                  .Ret<ffi::Buffer<ffi::U8>>());

// imagenet_normalize: (N, 3) uint8 -> (N, 3) float32, (x/255 - mean)/std.
static ffi::Error ImagenetNormalizeImpl(ffi::Buffer<ffi::U8> in,
                                        ffi::ResultBuffer<ffi::F32> out) {
  static const float mean[3] = {0.485f, 0.456f, 0.406f};
  static const float istd[3] = {1.0f / 0.229f, 1.0f / 0.224f, 1.0f / 0.225f};
  const int64_t n = in.element_count() / 3;
  const uint8_t* src = in.typed_data();
  float* dst = out->typed_data();
  for (int64_t i = 0; i < n; ++i) {
    for (int k = 0; k < 3; ++k) {
      dst[i * 3 + k] = (src[i * 3 + k] * (1.0f / 255.0f) - mean[k]) * istd[k];
    }
  }
  return ffi::Error::Success();
}

XLA_FFI_DEFINE_HANDLER_SYMBOL(kImagenetNormalize, ImagenetNormalizeImpl,
                              ffi::Ffi::Bind()
                                  .Arg<ffi::Buffer<ffi::U8>>()
                                  .Ret<ffi::Buffer<ffi::F32>>());

extern "C" {
// Plain accessors so ctypes can fetch the handler pointers for registration.
void* die_label_merge_handler() { return reinterpret_cast<void*>(kLabelMerge); }
void* die_imagenet_normalize_handler() {
  return reinterpret_cast<void*>(kImagenetNormalize);
}
}

// Native JPEG -> block-DCT coefficient decoder.
//
// TPU-native replacement for the reference's two C++ submodules
// (SURVEY.md §2.1): uber-research/jpeg2dct (Huffman-decode + dequantize,
// no IDCT; referenced at `classification_part/.../generators.py:10,183`) and
// D3lt4lph4/jpeg_decoder (partial-decode levels; referenced at
// `localisation_part/inference.py:19,132-159`).  One decode core serves both
// output contracts:
//   * per-component block tensors (h_blocks, w_blocks, 64), coefficients in
//     natural (row-major) frequency order, dequantized to true DCT values —
//     the jpeg2dct `load/loads` contract;
//   * the spatial "DCT image" layout (jpegdecoder level 2) is a pure reshape
//     of the same data, done on the Python side.
//
// Implementation: libjpeg's jpeg_read_coefficients() performs the entropy
// decode; we dequantize with the component quant tables and emit int32.
// Coefficient blocks and quant tables are both stored in natural order in
// libjpeg's in-memory representation, so dequantization is elementwise.
//
// Thread-safe: no globals; one jpeg_decompress_struct per call, so a host
// thread pool can decode many images in parallel behind the input pipeline.

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

namespace {

struct ErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
  char message[JMSG_LENGTH_MAX];
};

void error_exit(j_common_ptr cinfo) {
  ErrorMgr* err = reinterpret_cast<ErrorMgr*>(cinfo->err);
  (*cinfo->err->format_message)(cinfo, err->message);
  longjmp(err->setjmp_buffer, 1);
}

void silent_emit(j_common_ptr, int) {}

}  // namespace

extern "C" {

typedef struct {
  int n_components;
  int img_height;
  int img_width;
  int h_samp[4];     // per-component sampling factors
  int v_samp[4];
  int h_blocks[4];   // ceil(downsampled_height / 8)
  int w_blocks[4];
  int32_t* coeffs[4];  // h_blocks * w_blocks * 64 int32 each (malloc'd)
  char error[JMSG_LENGTH_MAX];
} DctDecoded;

// Decode a JPEG byte buffer to per-component DCT coefficient tensors.
// dequantize != 0 multiplies each coefficient by its quantizer step
// (the jpeg2dct behaviour). Returns 0 on success, nonzero on error with
// out->error filled. Caller must call dctjpeg_release().
int dctjpeg_decode(const uint8_t* data, size_t size, int dequantize,
                   DctDecoded* out) {
  memset(out, 0, sizeof(*out));

  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  jerr.pub.emit_message = silent_emit;
  jerr.message[0] = '\0';

  if (setjmp(jerr.setjmp_buffer)) {
    snprintf(out->error, sizeof(out->error), "%s", jerr.message);
    jpeg_destroy_decompress(&cinfo);
    for (int c = 0; c < 4; ++c) {
      free(out->coeffs[c]);
      out->coeffs[c] = nullptr;
    }
    return 1;
  }

  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<unsigned char*>(data),
               static_cast<unsigned long>(size));
  jpeg_read_header(&cinfo, TRUE);

  jvirt_barray_ptr* coef_arrays = jpeg_read_coefficients(&cinfo);
  if (coef_arrays == nullptr) {
    snprintf(out->error, sizeof(out->error), "jpeg_read_coefficients failed");
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }

  out->n_components = cinfo.num_components;
  out->img_height = static_cast<int>(cinfo.image_height);
  out->img_width = static_cast<int>(cinfo.image_width);
  if (out->n_components > 4) out->n_components = 4;

  int max_h = cinfo.max_h_samp_factor;
  int max_v = cinfo.max_v_samp_factor;

  for (int ci = 0; ci < out->n_components; ++ci) {
    jpeg_component_info* comp = &cinfo.comp_info[ci];
    out->h_samp[ci] = comp->h_samp_factor;
    out->v_samp[ci] = comp->v_samp_factor;
    // Downsampled component size from the image dims (independent of MCU
    // padding), matching the jpeg2dct "normalized" shape: e.g. 224x224 4:2:0
    // -> Y 28x28, Cb/Cr 14x14 blocks.
    long ds_h = (static_cast<long>(cinfo.image_height) * comp->v_samp_factor +
                 max_v - 1) / max_v;
    long ds_w = (static_cast<long>(cinfo.image_width) * comp->h_samp_factor +
                 max_h - 1) / max_h;
    int hb = static_cast<int>((ds_h + 7) / 8);
    int wb = static_cast<int>((ds_w + 7) / 8);
    out->h_blocks[ci] = hb;
    out->w_blocks[ci] = wb;

    int32_t* dst = static_cast<int32_t*>(
        malloc(static_cast<size_t>(hb) * wb * DCTSIZE2 * sizeof(int32_t)));
    if (dst == nullptr) {
      snprintf(out->error, sizeof(out->error), "out of memory");
      jpeg_destroy_decompress(&cinfo);
      return 1;
    }
    out->coeffs[ci] = dst;

    JQUANT_TBL* qtbl = comp->quant_table;
    for (int by = 0; by < hb; ++by) {
      JBLOCKARRAY rows = (*cinfo.mem->access_virt_barray)(
          reinterpret_cast<j_common_ptr>(&cinfo), coef_arrays[ci],
          static_cast<JDIMENSION>(by), 1, FALSE);
      JBLOCKROW row = rows[0];
      for (int bx = 0; bx < wb; ++bx) {
        JCOEFPTR block = row[bx];
        int32_t* o = dst + (static_cast<size_t>(by) * wb + bx) * DCTSIZE2;
        if (dequantize && qtbl != nullptr) {
          for (int k = 0; k < DCTSIZE2; ++k) {
            o[k] = static_cast<int32_t>(block[k]) *
                   static_cast<int32_t>(qtbl->quantval[k]);
          }
        } else {
          for (int k = 0; k < DCTSIZE2; ++k) {
            o[k] = static_cast<int32_t>(block[k]);
          }
        }
      }
    }
  }

  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

void dctjpeg_release(DctDecoded* out) {
  for (int c = 0; c < 4; ++c) {
    free(out->coeffs[c]);
    out->coeffs[c] = nullptr;
  }
}

}  // extern "C"

// creste_io: native decode + sample-assembly core for the CODa data layer.
//
// Replaces the reference's torch DataLoader worker processes
// (SURVEY §2.7 "DataLoader workers": num_workers 6-8 python processes doing
// PIL decode) with an in-process C library: libjpeg/libpng decode straight
// into caller-provided buffers, plus a fused RGBD assembler that decodes
// the JPEG + 16-bit depth PNG and writes the normalized [H, W, 4] float
// tensor in one pass (RGB/255 + depth-mm channel, matching
// codapefree_dataloader.py:843-879). Python drives it through ctypes from a
// thread pool — ctypes calls drop the GIL, so decode runs genuinely
// parallel without process forking.
//
// Build: see native/Makefile (g++ -O3 -shared -fPIC, links -ljpeg -lpng -lz).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <csetjmp>

#include <jpeglib.h>
#include <png.h>

extern "C" {

// ---------------------------------------------------------------------------
// JPEG
// ---------------------------------------------------------------------------

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jump;
};

static void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jump, 1);
}

// Query JPEG dimensions. Returns 0 on success.
int jpeg_info(const char* path, int* h, int* w, int* channels) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return -2;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  *h = cinfo.image_height;
  *w = cinfo.image_width;
  *channels = cinfo.num_components;
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return 0;
}

// Decode a JPEG into out[h*w*3] (RGB, uint8). Returns 0 on success.
int jpeg_decode(const char* path, uint8_t* out, int h, int w) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return -2;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  if ((int)cinfo.output_height != h || (int)cinfo.output_width != w) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return -3;
  }
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out + size_t(cinfo.output_scanline) * w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return 0;
}

// ---------------------------------------------------------------------------
// 16-bit grayscale PNG (depth-mm labels)
// ---------------------------------------------------------------------------

int png16_info(const char* path, int* h, int* w) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(f);
    return -2;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  *h = png_get_image_height(png, info);
  *w = png_get_image_width(png, info);
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(f);
  return 0;
}

// Decode a 16-bit grayscale PNG into out[h*w] (native-endian uint16).
int png16_decode(const char* path, uint16_t* out, int h, int w) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(f);
    return -2;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  if ((int)png_get_image_height(png, info) != h ||
      (int)png_get_image_width(png, info) != w) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(f);
    return -3;
  }
  int depth = png_get_bit_depth(png, info);
  if (depth == 16) png_set_swap(png);  // PNG is big-endian on disk
  png_read_update_info(png, info);
  for (int y = 0; y < h; ++y) {
    png_read_row(png, reinterpret_cast<png_bytep>(out + size_t(y) * w),
                 nullptr);
  }
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(f);
  return 0;
}

// ---------------------------------------------------------------------------
// Fused RGBD sample assembly
// ---------------------------------------------------------------------------

// Decode jpeg_path + depth png_path and write the [h, w, 4] float32 tensor:
// channels 0..2 = RGB/255, channel 3 = depth in mm (float). The depth PNG
// may be absent (null/empty path) -> channel 3 zeros.
int assemble_rgbd(const char* jpeg_path, const char* png_path, float* out,
                  int h, int w) {
  // stack buffers would be too big; one heap scratch per call
  uint8_t* rgb = new uint8_t[size_t(h) * w * 3];
  int rc = jpeg_decode(jpeg_path, rgb, h, w);
  if (rc != 0) {
    delete[] rgb;
    return rc;
  }
  uint16_t* depth = nullptr;
  if (png_path && png_path[0]) {
    depth = new uint16_t[size_t(h) * w];
    rc = png16_decode(png_path, depth, h, w);
    if (rc != 0) {
      delete[] rgb;
      delete[] depth;
      return rc - 10;
    }
  }
  const float inv255 = 1.0f / 255.0f;
  for (size_t i = 0, n = size_t(h) * w; i < n; ++i) {
    out[i * 4 + 0] = rgb[i * 3 + 0] * inv255;
    out[i * 4 + 1] = rgb[i * 3 + 1] * inv255;
    out[i * 4 + 2] = rgb[i * 3 + 2] * inv255;
    out[i * 4 + 3] = depth ? float(depth[i]) : 0.0f;
  }
  delete[] rgb;
  delete[] depth;
  return 0;
}

// ---------------------------------------------------------------------------
// LiDAR .bin reader
// ---------------------------------------------------------------------------

// Read up to max_floats float32s; returns the count read or <0 on error.
long long bin_read(const char* path, float* out, long long max_floats) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  long long n = (long long)fread(out, sizeof(float), max_floats, f);
  fclose(f);
  return n;
}

}  // extern "C"

// Image decode (JPEG via libjpeg, PNG via libpng, binary PPM) + bilinear
// resize to RGB u8 HWC. Host-side replacement for the reference's PIL
// decode + RectScale resize (SURVEY.md §2 #12).
#include "ssg_data.h"

#include <csetjmp>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

#include <jpeglib.h>
#include <png.h>

namespace {

struct Image {
  int h = 0, w = 0;          // decoded size
  std::vector<uint8_t> rgb;  // h*w*3
};

// ---- JPEG -----------------------------------------------------------------

struct JpegErr {
  jpeg_error_mgr pub;
  jmp_buf jump;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  longjmp(reinterpret_cast<JpegErr*>(cinfo->err)->jump, 1);
}

// EXIF orientation (tag 0x0112) from a raw APP1 "Exif\0\0" payload.
// Minimal TIFF walk: byte order, IFD0, scan entries. Returns 1..8, or 1 on
// any parse doubt (identity — never worse than ignoring EXIF entirely).
int parse_exif_orientation(const uint8_t* d, unsigned len) {
  if (len < 14 || std::memcmp(d, "Exif\0\0", 6) != 0) return 1;
  const uint8_t* t = d + 6;  // TIFF header
  unsigned tlen = len - 6;
  bool le;
  if (t[0] == 'I' && t[1] == 'I') le = true;
  else if (t[0] == 'M' && t[1] == 'M') le = false;
  else return 1;
  auto u16 = [&](unsigned off) -> unsigned {
    return le ? t[off] | (t[off + 1] << 8) : (t[off] << 8) | t[off + 1];
  };
  auto u32 = [&](unsigned off) -> unsigned {
    return le ? t[off] | (t[off + 1] << 8) | (t[off + 2] << 16) |
                    (static_cast<unsigned>(t[off + 3]) << 24)
              : (static_cast<unsigned>(t[off]) << 24) | (t[off + 1] << 16) |
                    (t[off + 2] << 8) | t[off + 3];
  };
  if (tlen < 8 || u16(2) != 42) return 1;
  unsigned ifd = u32(4);
  // ifd is untrusted 32-bit file data: compare without adding to it, or
  // `ifd + 2` wraps for ifd >= 0xFFFFFFFE and the guard passes an OOB read.
  if (tlen < 2 || ifd > tlen - 2) return 1;
  unsigned n = u16(ifd);
  for (unsigned i = 0; i < n; ++i) {
    // ifd <= tlen-2 <= 65531 (APP1 payload cap) and n <= 65535, so this
    // arithmetic cannot wrap uint32; the bound itself is still required.
    unsigned e = ifd + 2 + i * 12;
    if (e + 12 > tlen) return 1;
    if (u16(e) == 0x0112 && u16(e + 2) == 3) {  // SHORT orientation
      unsigned v = u16(e + 8);
      return (v >= 1 && v <= 8) ? static_cast<int>(v) : 1;
    }
  }
  return 1;
}

// Apply an EXIF orientation to a decoded image (same convention as
// PIL.ImageOps.exif_transpose): map each output pixel to its source.
void apply_orientation(Image* im, int o) {
  if (o <= 1 || o > 8) return;
  const int h = im->h, w = im->w;
  const bool swap = o >= 5;  // 5..8 transpose h/w
  const int oh = swap ? w : h, ow = swap ? h : w;
  std::vector<uint8_t> out(static_cast<size_t>(oh) * ow * 3);
  for (int y = 0; y < oh; ++y) {
    for (int x = 0; x < ow; ++x) {
      int sy, sx;
      switch (o) {
        case 2: sy = y; sx = w - 1 - x; break;          // flip H
        case 3: sy = h - 1 - y; sx = w - 1 - x; break;  // rot 180
        case 4: sy = h - 1 - y; sx = x; break;          // flip V
        case 5: sy = x; sx = y; break;                  // transpose
        case 6: sy = h - 1 - x; sx = y; break;          // rot 90 CW
        case 7: sy = h - 1 - x; sx = w - 1 - y; break;  // transverse
        default: sy = x; sx = w - 1 - y; break;         // 8: rot 270 CW
      }
      std::memcpy(out.data() + (static_cast<size_t>(y) * ow + x) * 3,
                  im->rgb.data() + (static_cast<size_t>(sy) * w + sx) * 3, 3);
    }
  }
  im->h = oh;
  im->w = ow;
  im->rgb.swap(out);
}

int decode_jpeg(FILE* f, Image* im) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return SSG_ERR_DECODE;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_save_markers(&cinfo, JPEG_APP0 + 1, 0xFFFF);  // EXIF
  jpeg_read_header(&cinfo, TRUE);
  // CMYK/YCCK (Adobe) JPEGs can't be converted to RGB by libjpeg itself:
  // decode raw 4-channel and convert below (values are stored inverted,
  // the Adobe convention — same handling as libjpeg-turbo/PIL).
  const bool cmyk = cinfo.jpeg_color_space == JCS_CMYK ||
                    cinfo.jpeg_color_space == JCS_YCCK;
  cinfo.out_color_space = cmyk ? JCS_CMYK : JCS_RGB;
  // Only the APP1 marker whose payload starts "Exif\0\0" carries EXIF; a
  // later non-EXIF APP1 (XMP, which always follows EXIF in real photos)
  // must not overwrite an orientation already parsed.
  int orientation = 1;
  for (jpeg_saved_marker_ptr m = cinfo.marker_list; m; m = m->next) {
    if (m->marker == JPEG_APP0 + 1 && m->data_length >= 14 &&
        std::memcmp(m->data, "Exif\0\0", 6) == 0) {
      orientation = parse_exif_orientation(m->data, m->data_length);
      break;
    }
  }
  jpeg_start_decompress(&cinfo);
  im->w = static_cast<int>(cinfo.output_width);
  im->h = static_cast<int>(cinfo.output_height);
  im->rgb.resize(static_cast<size_t>(im->h) * im->w * 3);
  const int comps = cinfo.output_components;  // 3 (RGB) or 4 (CMYK)
  std::vector<uint8_t> line(static_cast<size_t>(im->w) * comps);
  while (cinfo.output_scanline < cinfo.output_height) {
    const size_t y = cinfo.output_scanline;
    JSAMPROW row = line.data();
    jpeg_read_scanlines(&cinfo, &row, 1);
    uint8_t* dst = im->rgb.data() + y * im->w * 3;
    if (cmyk) {
      for (int x = 0; x < im->w; ++x) {
        const uint8_t* p = line.data() + static_cast<size_t>(x) * 4;
        const unsigned k = p[3];
        dst[x * 3 + 0] = static_cast<uint8_t>(p[0] * k / 255);
        dst[x * 3 + 1] = static_cast<uint8_t>(p[1] * k / 255);
        dst[x * 3 + 2] = static_cast<uint8_t>(p[2] * k / 255);
      }
    } else {
      std::memcpy(dst, line.data(), static_cast<size_t>(im->w) * 3);
    }
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  apply_orientation(im, orientation);
  return SSG_OK;
}

// ---- PNG ------------------------------------------------------------------

int decode_png(FILE* f, Image* im) {
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return SSG_ERR_DECODE;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return SSG_ERR_DECODE;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return SSG_ERR_DECODE;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  // Normalize every variant to 8-bit RGB.
  png_byte color = png_get_color_type(png, info);
  png_byte depth = png_get_bit_depth(png, info);
  if (depth == 16) png_set_strip_16(png);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color == PNG_COLOR_TYPE_GRAY || color == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  if (color & PNG_COLOR_MASK_ALPHA || png_get_valid(png, info, PNG_INFO_tRNS))
    png_set_strip_alpha(png);
  png_read_update_info(png, info);

  im->w = static_cast<int>(png_get_image_width(png, info));
  im->h = static_cast<int>(png_get_image_height(png, info));
  im->rgb.resize(static_cast<size_t>(im->h) * im->w * 3);
  std::vector<png_bytep> rows(im->h);
  for (int y = 0; y < im->h; ++y)
    rows[y] = im->rgb.data() + static_cast<size_t>(y) * im->w * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  return SSG_OK;
}

// ---- PPM (binary P6) ------------------------------------------------------

int ppm_token(FILE* f, long* out) {
  int c;
  do {
    c = fgetc(f);
    if (c == '#') {  // comment to end of line
      while (c != '\n' && c != EOF) c = fgetc(f);
    }
  } while (c == ' ' || c == '\t' || c == '\n' || c == '\r');
  if (c == EOF) return SSG_ERR_DECODE;
  long v = 0;
  while (c >= '0' && c <= '9') {
    v = v * 10 + (c - '0');
    c = fgetc(f);
  }
  *out = v;
  return SSG_OK;
}

int decode_ppm(FILE* f, Image* im) {
  if (fgetc(f) != 'P' || fgetc(f) != '6') return SSG_ERR_DECODE;
  long w, h, maxv;
  if (ppm_token(f, &w) || ppm_token(f, &h) || ppm_token(f, &maxv)) return SSG_ERR_DECODE;
  if (w <= 0 || h <= 0 || maxv != 255) return SSG_ERR_DECODE;
  im->w = static_cast<int>(w);
  im->h = static_cast<int>(h);
  size_t sz = static_cast<size_t>(w) * h * 3;
  im->rgb.resize(sz);
  if (fread(im->rgb.data(), 1, sz, f) != sz) return SSG_ERR_DECODE;
  return SSG_OK;
}

int decode_file(const char* path, Image* im) {
  FILE* f = fopen(path, "rb");
  if (!f) return SSG_ERR_OPEN;
  unsigned char magic[8] = {0};
  size_t got = fread(magic, 1, sizeof(magic), f);
  rewind(f);
  int rc = SSG_ERR_DECODE;
  if (got >= 2 && magic[0] == 0xFF && magic[1] == 0xD8) {
    rc = decode_jpeg(f, im);
  } else if (got >= 8 && !png_sig_cmp(magic, 0, 8)) {
    rc = decode_png(f, im);
  } else if (got >= 2 && magic[0] == 'P' && magic[1] == '6') {
    rc = decode_ppm(f, im);
  }
  fclose(f);
  return rc;
}

// ---- bilinear resize ------------------------------------------------------
// align_corners=false (pixel-center) sampling — matches
// jax.image.resize(method='bilinear') and cv2.INTER_LINEAR so the host
// fast path and the on-device transform agree.
void resize_bilinear(const Image& src, int oh, int ow, uint8_t* out) {
  if (src.h == oh && src.w == ow) {
    std::memcpy(out, src.rgb.data(), src.rgb.size());
    return;
  }
  const float sy = static_cast<float>(src.h) / oh;
  const float sx = static_cast<float>(src.w) / ow;
  // Precompute x-axis taps once per row sweep.
  std::vector<int> x0(ow), x1(ow);
  std::vector<float> fx(ow);
  for (int x = 0; x < ow; ++x) {
    float pos = (x + 0.5f) * sx - 0.5f;
    if (pos < 0) pos = 0;
    int xi = static_cast<int>(pos);
    if (xi > src.w - 1) xi = src.w - 1;
    x0[x] = xi;
    x1[x] = xi + 1 < src.w ? xi + 1 : src.w - 1;
    fx[x] = pos - xi;
  }
  for (int y = 0; y < oh; ++y) {
    float pos = (y + 0.5f) * sy - 0.5f;
    if (pos < 0) pos = 0;
    int y0 = static_cast<int>(pos);
    if (y0 > src.h - 1) y0 = src.h - 1;
    int y1 = y0 + 1 < src.h ? y0 + 1 : src.h - 1;
    float dy = pos - y0;
    const uint8_t* r0 = src.rgb.data() + static_cast<size_t>(y0) * src.w * 3;
    const uint8_t* r1 = src.rgb.data() + static_cast<size_t>(y1) * src.w * 3;
    uint8_t* orow = out + static_cast<size_t>(y) * ow * 3;
    for (int x = 0; x < ow; ++x) {
      const uint8_t* p00 = r0 + x0[x] * 3;
      const uint8_t* p01 = r0 + x1[x] * 3;
      const uint8_t* p10 = r1 + x0[x] * 3;
      const uint8_t* p11 = r1 + x1[x] * 3;
      float dx = fx[x];
      for (int c = 0; c < 3; ++c) {
        float top = p00[c] + (p01[c] - p00[c]) * dx;
        float bot = p10[c] + (p11[c] - p10[c]) * dx;
        float v = top + (bot - top) * dy;
        orow[x * 3 + c] = static_cast<uint8_t>(v + 0.5f);
      }
    }
  }
}

}  // namespace

extern "C" int ssg_decode_resize(const char* path, int out_h, int out_w, uint8_t* out) {
  if (!path || !out || out_h <= 0 || out_w <= 0) return SSG_ERR_ARG;
  Image im;
  int rc = decode_file(path, &im);
  if (rc != SSG_OK) return rc;
  resize_bilinear(im, out_h, out_w, out);
  return SSG_OK;
}

extern "C" int ssg_data_version(void) { return 1; }

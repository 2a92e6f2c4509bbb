// Native input pipeline: decode (JPEG/PNG) + bilinear resize + canvas
// placement, batch-parallel with an internal thread pool.
//
// The reference's data layer runs 8 torch DataLoader worker PROCESSES
// (trainval_net_voc.py:232-235) because its per-item python work (imageio
// decode + cv2 + numpy, roibatchLoader.py:97-285) doesn't scale under the
// GIL.  Here the per-item image work is a C ABI call instead: the python
// loader keeps the (cheap, rng-bearing) sampling logic and hands the whole
// batch's decode/resize/canvas work to these functions, which spread items
// over std::threads with no GIL involvement.
//
// Semantics pinned to ait_tpu/data/transforms.py (which is itself pinned to
// the reference's blob.py):
//   * shortest-side scale to `target_size`, capped so the result fits the
//     canvas; output dims = lrint(src * scale)  (cv2.resize dsize rounding);
//   * bilinear sampling on the half-pixel grid sx=(dx+0.5)*inv-0.5 clamped
//     at the borders (cv2 INTER_LINEAR; float math here vs cv2's /2048
//     fixed point - differs by at most 1 LSB);
//   * canvas filled with the torchvision mean pixel so the device-side
//     normalize maps padding to ~0 (transforms.place_on_canvas);
//   * query: crop int-truncated box, center-pad to square, resize to
//     query_size (blob.py:65-99 via transforms.crop_query).
//
// Every function returns the number of FAILED items; a failed item has
// info[2] (scale) == 0 and its output buffer zeroed - the python caller
// redoes those through the imageio fallback path.

#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <functional>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>

namespace {

struct Image {
  std::vector<uint8_t> data;  // HxWx3, RGB
  int h = 0, w = 0;
};

// ---------------------------------------------------------------- decode

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* e = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(e->jb, 1);
}

bool decode_jpeg(FILE* f, Image* out) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;  // libjpeg converts gray/YCbCr/CMYK
  jpeg_start_decompress(&cinfo);
  out->w = cinfo.output_width;
  out->h = cinfo.output_height;
  out->data.resize(size_t(out->h) * out->w * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = out->data.data() + size_t(cinfo.output_scanline) * out->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

bool decode_png(FILE* f, Image* out) {
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                           nullptr, nullptr);
  if (!png) return false;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return false;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  // normalize anything to 8-bit RGB
  png_set_strip_16(png);
  png_set_palette_to_rgb(png);
  png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  png_set_strip_alpha(png);
  png_set_gray_to_rgb(png);
  png_read_update_info(png, info);
  out->w = png_get_image_width(png, info);
  out->h = png_get_image_height(png, info);
  if (png_get_rowbytes(png, info) != size_t(out->w) * 3) {
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }
  out->data.resize(size_t(out->h) * out->w * 3);
  std::vector<png_bytep> rows(out->h);
  for (int y = 0; y < out->h; ++y)
    rows[y] = out->data.data() + size_t(y) * out->w * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

bool decode_file(const char* path, Image* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  unsigned char magic[2] = {0, 0};
  if (std::fread(magic, 1, 2, f) != 2) {
    std::fclose(f);
    return false;
  }
  std::rewind(f);
  bool ok = false;
  if (magic[0] == 0xFF && magic[1] == 0xD8)
    ok = decode_jpeg(f, out);
  else if (magic[0] == 0x89 && magic[1] == 0x50)
    ok = decode_png(f, out);
  std::fclose(f);
  return ok && out->h > 0 && out->w > 0;
}

// ---------------------------------------------------------------- resize

// cv2-style bilinear (half-pixel grid, border clamp), separable two-pass.
void resize_bilinear(const uint8_t* src, int sh, int sw, uint8_t* dst,
                     int dh, int dw) {
  if (sh == dh && sw == dw) {
    std::memcpy(dst, src, size_t(sh) * sw * 3);
    return;
  }
  const double inv_x = double(sw) / dw, inv_y = double(sh) / dh;
  std::vector<int> x0(dw);
  std::vector<float> fx(dw);
  for (int x = 0; x < dw; ++x) {
    double sx = (x + 0.5) * inv_x - 0.5;
    if (sx < 0) sx = 0;
    if (sx > sw - 1) sx = sw - 1;
    int ix = int(sx);
    if (ix > sw - 2) ix = sw - 2 < 0 ? 0 : sw - 2;
    x0[x] = ix;
    fx[x] = float(sx - ix);
  }
  // horizontal pass into float rows, then vertical interpolation
  std::vector<float> tmp(size_t(sh) * dw * 3);
  for (int y = 0; y < sh; ++y) {
    const uint8_t* srow = src + size_t(y) * sw * 3;
    float* trow = tmp.data() + size_t(y) * dw * 3;
    for (int x = 0; x < dw; ++x) {
      const uint8_t* p0 = srow + x0[x] * 3;
      const uint8_t* p1 = srow + (sw > 1 ? (x0[x] + 1) * 3 : x0[x] * 3);
      float f = fx[x];
      trow[x * 3 + 0] = p0[0] + f * (p1[0] - p0[0]);
      trow[x * 3 + 1] = p0[1] + f * (p1[1] - p0[1]);
      trow[x * 3 + 2] = p0[2] + f * (p1[2] - p0[2]);
    }
  }
  for (int y = 0; y < dh; ++y) {
    double sy = (y + 0.5) * inv_y - 0.5;
    if (sy < 0) sy = 0;
    if (sy > sh - 1) sy = sh - 1;
    int iy = int(sy);
    if (iy > sh - 2) iy = sh - 2 < 0 ? 0 : sh - 2;
    float f = float(sy - iy);
    const float* r0 = tmp.data() + size_t(iy) * dw * 3;
    const float* r1 = tmp.data() + size_t(sh > 1 ? iy + 1 : iy) * dw * 3;
    uint8_t* drow = dst + size_t(y) * dw * 3;
    for (int i = 0; i < dw * 3; ++i) {
      // v >= 0 always (lerp of uint8 values), so round = trunc(v + 0.5)
      int iv = int(r0[i] + f * (r1[i] - r0[i]) + 0.5f);
      drow[i] = uint8_t(iv > 255 ? 255 : iv);
    }
  }
}

void hflip_inplace(Image* im) {
  for (int y = 0; y < im->h; ++y) {
    uint8_t* row = im->data.data() + size_t(y) * im->w * 3;
    for (int x = 0; x < im->w / 2; ++x) {
      for (int c = 0; c < 3; ++c)
        std::swap(row[x * 3 + c], row[(im->w - 1 - x) * 3 + c]);
    }
  }
}

void parallel_for(int n, int n_threads, const std::function<void(int)>& fn) {
  int hw = int(std::thread::hardware_concurrency());
  if (hw > 0 && n_threads > hw) n_threads = hw;  // oversubscribing loses
  int nt = n_threads < 1 ? 1 : (n_threads > n ? n : n_threads);
  if (nt <= 1) {
    for (int i = 0; i < n; ++i) fn(i);
    return;
  }
  std::atomic<int> next(0);
  std::vector<std::thread> threads;
  threads.reserve(nt);
  for (int t = 0; t < nt; ++t) {
    threads.emplace_back([&]() {
      for (int i = next.fetch_add(1); i < n; i = next.fetch_add(1)) fn(i);
    });
  }
  for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

// Targets: decode -> flip -> shortest-side scale (canvas-capped) -> canvas.
//   paths[n], flip[n]; out_canvases: n * ch * cw * 3 uint8 (C-contiguous),
//   or n * (ch/2) * (cw/2) * 12 with s2d != 0 (space-to-depth emitted
//   directly during canvas placement — saves a second full-batch pass);
//   out_info: n * 3 f32 rows (scaled_h, scaled_w, scale); fill[3] uint8.
// Returns the number of failed items (their info row is zeroed).
int ail_prep_targets2(int64_t n, const char** paths, const uint8_t* flip,
                      int32_t target_size, int32_t canvas_h, int32_t canvas_w,
                      const uint8_t* fill, int32_t s2d, uint8_t* out_canvases,
                      float* out_info, int32_t n_threads) {
  std::atomic<int> failed(0);
  const size_t canvas_bytes = size_t(canvas_h) * canvas_w * 3;  // same if s2d
  parallel_for(int(n), n_threads, [&](int i) {
    uint8_t* canvas = out_canvases + size_t(i) * canvas_bytes;
    float* info = out_info + size_t(i) * 3;
    Image im;
    if (!decode_file(paths[i], &im)) {
      std::memset(canvas, 0, canvas_bytes);
      info[0] = info[1] = info[2] = 0.f;
      failed.fetch_add(1);
      return;
    }
    if (flip[i]) hflip_inplace(&im);
    double scale = double(target_size) / (im.h < im.w ? im.h : im.w);
    if (scale * im.h > canvas_h) scale = double(canvas_h) / im.h;
    if (scale * im.w > canvas_w) scale = double(canvas_w) / im.w;
    int dh = int(std::lrint(im.h * scale));
    int dw = int(std::lrint(im.w * scale));
    if (dh > canvas_h) dh = canvas_h;
    if (dw > canvas_w) dw = canvas_w;
    std::vector<uint8_t> resized(size_t(dh) * dw * 3);
    resize_bilinear(im.data.data(), im.h, im.w, resized.data(), dh, dw);
    if (s2d) {
      // fused canvas + space-to-depth: channel = dy*6 + dx*3 + c
      // (matches ail_space_to_depth / transforms.space_to_depth bitwise)
      const int oh = canvas_h / 2, ow = canvas_w / 2;
      for (int y = 0; y < oh; ++y) {
        uint8_t* drow = canvas + size_t(y) * ow * 12;
        for (int x = 0; x < ow; ++x) {
          uint8_t* px = drow + size_t(x) * 12;
          for (int dy = 0; dy < 2; ++dy) {
            const int sy = 2 * y + dy;
            for (int dx = 0; dx < 2; ++dx) {
              const int sx = 2 * x + dx;
              uint8_t* o = px + (dy * 6 + dx * 3);
              if (sy < dh && sx < dw) {
                const uint8_t* sp =
                    resized.data() + (size_t(sy) * dw + sx) * 3;
                o[0] = sp[0];
                o[1] = sp[1];
                o[2] = sp[2];
              } else {
                o[0] = fill[0];
                o[1] = fill[1];
                o[2] = fill[2];
              }
            }
          }
        }
      }
    } else {
      for (int y = 0; y < canvas_h; ++y) {
        uint8_t* row = canvas + size_t(y) * canvas_w * 3;
        if (y < dh) {
          std::memcpy(row, resized.data() + size_t(y) * dw * 3,
                      size_t(dw) * 3);
          for (int x = dw; x < canvas_w; ++x) {
            row[x * 3 + 0] = fill[0];
            row[x * 3 + 1] = fill[1];
            row[x * 3 + 2] = fill[2];
          }
        } else {
          for (int x = 0; x < canvas_w; ++x) {
            row[x * 3 + 0] = fill[0];
            row[x * 3 + 1] = fill[1];
            row[x * 3 + 2] = fill[2];
          }
        }
      }
    }
    info[0] = float(dh);
    info[1] = float(dw);
    info[2] = float(scale);
  });
  return failed.load();
}

// Legacy ABI (no s2d flag) — kept so an older ait_tpu/native.py still binds.
int ail_prep_targets(int64_t n, const char** paths, const uint8_t* flip,
                     int32_t target_size, int32_t canvas_h, int32_t canvas_w,
                     const uint8_t* fill, uint8_t* out_canvases,
                     float* out_info, int32_t n_threads) {
  return ail_prep_targets2(n, paths, flip, target_size, canvas_h, canvas_w,
                           fill, 0, out_canvases, out_info, n_threads);
}

// Queries: decode -> crop int-truncated box -> center-pad square -> resize
// to query_size -> optional hflip.  boxes: n x 4 f64 (x1,y1,x2,y2).
//   out: n * qs * qs * 3 uint8.  ok: n uint8 (1 = produced, 0 = failed).
int ail_prep_queries(int64_t n, const char** paths, const double* boxes,
                     const uint8_t* flip, int32_t query_size, uint8_t* out,
                     uint8_t* ok, int32_t n_threads) {
  std::atomic<int> failed(0);
  parallel_for(int(n), n_threads, [&](int i) {
    uint8_t* dst = out + size_t(i) * query_size * query_size * 3;
    Image im;
    if (!decode_file(paths[i], &im)) {
      std::memset(dst, 0, size_t(query_size) * query_size * 3);
      ok[i] = 0;
      failed.fetch_add(1);
      return;
    }
    const double* b = boxes + i * 4;
    int x1 = int(b[0]), y1 = int(b[1]), x2 = int(b[2]), y2 = int(b[3]);
    if (x1 < 0) x1 = 0;
    if (y1 < 0) y1 = 0;
    if (x2 > im.w) x2 = im.w;
    if (y2 > im.h) y2 = im.h;
    int cw = x2 - x1, ch = y2 - y1;
    Image cut;
    if (cw <= 0 || ch <= 0) {  // degenerate -> 1x1 zeros (transforms.py:66)
      cut.h = cut.w = 1;
      cut.data.assign(3, 0);
    } else {
      cut.h = ch;
      cut.w = cw;
      cut.data.resize(size_t(ch) * cw * 3);
      for (int y = 0; y < ch; ++y)
        std::memcpy(cut.data.data() + size_t(y) * cw * 3,
                    im.data.data() + (size_t(y1 + y) * im.w + x1) * 3,
                    size_t(cw) * 3);
    }
    // center-pad to square (transforms.crop_query integer logic)
    int m = cut.h > cut.w ? cut.h : cut.w;
    int cty = cut.h / 2, ctx = cut.w / 2;
    int xs0 = ctx - m / 2 < 0 ? 0 : ctx - m / 2;
    int xs1 = ctx + m / 2 > cut.w ? cut.w : ctx + m / 2;
    int ys0 = cty - m / 2 < 0 ? 0 : cty - m / 2;
    int ys1 = cty + m / 2 > cut.h ? cut.h : cty + m / 2;
    Image sq;
    sq.h = sq.w = m;
    sq.data.assign(size_t(m) * m * 3, 0);
    int oy = m / 2 - (cty - ys0), ox = m / 2 - (ctx - xs0);
    for (int y = ys0; y < ys1; ++y)
      std::memcpy(sq.data.data() + (size_t(oy + y - ys0) * m + ox) * 3,
                  cut.data.data() + (size_t(y) * cut.w + xs0) * 3,
                  size_t(xs1 - xs0) * 3);
    resize_bilinear(sq.data.data(), m, m, dst, query_size, query_size);
    if (flip[i]) {
      Image q;
      q.h = q.w = query_size;
      q.data.assign(dst, dst + size_t(query_size) * query_size * 3);
      hflip_inplace(&q);
      std::memcpy(dst, q.data.data(), q.data.size());
    }
    ok[i] = 1;
  });
  return failed.load();
}

}  // extern "C"

// Space-to-depth: [n, h, w, 3] u8 -> [n, h/2, w/2, 12] u8 with
// channel = dy*6 + dx*3 + c (matches the device stem regroup and
// transforms.space_to_depth).
extern "C" int ail_space_to_depth(int64_t n, int32_t h, int32_t w,
                                  const uint8_t* src, uint8_t* dst,
                                  int32_t n_threads) {
  int oh = h / 2, ow = w / 2;
  parallel_for(int(n), n_threads, [&](int i) {
    const uint8_t* s = src + size_t(i) * h * w * 3;
    uint8_t* d = dst + size_t(i) * oh * ow * 12;
    for (int y = 0; y < oh; ++y) {
      const uint8_t* r0 = s + size_t(2 * y) * w * 3;
      const uint8_t* r1 = r0 + size_t(w) * 3;
      uint8_t* drow = d + size_t(y) * ow * 12;
      for (int x = 0; x < ow; ++x) {
        std::memcpy(drow + size_t(x) * 12 + 0, r0 + size_t(2 * x) * 3, 6);
        std::memcpy(drow + size_t(x) * 12 + 6, r1 + size_t(2 * x) * 3, 6);
      }
    }
  });
  return 0;
}

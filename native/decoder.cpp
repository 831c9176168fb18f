// Native host-side image decode + canvas paste (TPU-native equivalent of
// the reference's PIL/libjpeg worker path — SURVEY.md N4/N6).
//
// The hot host loop per sample is: decode JPEG/PNG -> paste uint8 RGB into a
// static canvas slot -> record (h, w).  PIL does this through several Python
// layers and an extra copy; this module decodes straight into the batch
// canvas with libjpeg/libpng and a std::thread pool, exposed to Python via
// ctypes (no pybind11 in this image).
//
// API (C, ctypes-friendly):
//   ssseg_decode_image(path, canvas_ptr, canvas_h, canvas_w, out_hw[2]) -> 0/err
//       decodes into the (canvas_h, canvas_w, 3) uint8 buffer (top-left
//       paste, cropped to canvas if larger), writes true h/w.
//   ssseg_decode_label(path, canvas_ptr, canvas_h, canvas_w, out_hw[2]) -> 0/err
//       8-bit single-channel PNG label -> int32 buffer.
//   ssseg_decode_batch(paths[], n, canvas_ptr, ..., sizes_ptr, threads) -> 0/err
//       thread-pooled batch decode of images.
//
// Build: g++ -O3 -march=native -shared -fPIC decoder.cpp -o libsssegio.so -ljpeg -lpng

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <string>
#include <thread>
#include <vector>
#include <atomic>

#include <jpeglib.h>
#include <png.h>

namespace {

struct JpegErr {
    jpeg_error_mgr pub;
    jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
    JpegErr* e = reinterpret_cast<JpegErr*>(cinfo->err);
    longjmp(e->jb, 1);
}

// Decode a JPEG file into RGB; returns rows written via the callback.
int decode_jpeg_into(const char* path, uint8_t* canvas, int ch, int cw,
                     int* out_h, int* out_w) {
    FILE* f = fopen(path, "rb");
    if (!f) return 2;
    jpeg_decompress_struct cinfo;
    JpegErr jerr;
    cinfo.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = jpeg_err_exit;
    if (setjmp(jerr.jb)) {
        jpeg_destroy_decompress(&cinfo);
        fclose(f);
        return 3;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_stdio_src(&cinfo, f);
    jpeg_read_header(&cinfo, TRUE);
    cinfo.out_color_space = JCS_RGB;
    jpeg_start_decompress(&cinfo);
    const int h = static_cast<int>(cinfo.output_height);
    const int w = static_cast<int>(cinfo.output_width);
    std::vector<uint8_t> row(static_cast<size_t>(w) * 3);
    uint8_t* rowp = row.data();
    const int copy_w = w < cw ? w : cw;
    for (int y = 0; y < h; ++y) {
        jpeg_read_scanlines(&cinfo, &rowp, 1);
        if (y < ch) {
            std::memcpy(canvas + (static_cast<size_t>(y) * cw) * 3, rowp,
                        static_cast<size_t>(copy_w) * 3);
        }
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    *out_h = h < ch ? h : ch;
    *out_w = copy_w;
    return 0;
}

// Decode a PNG (RGB/RGBA/gray) into the RGB canvas, or (gray/palette) into
// an int32 label canvas when label_canvas != nullptr.
int decode_png_into(const char* path, uint8_t* canvas, int32_t* label_canvas,
                    int ch, int cw, int* out_h, int* out_w) {
    FILE* f = fopen(path, "rb");
    if (!f) return 2;
    png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                             nullptr, nullptr);
    if (!png) { fclose(f); return 3; }
    png_infop info = png_create_info_struct(png);
    if (!info) { png_destroy_read_struct(&png, nullptr, nullptr); fclose(f); return 3; }
    if (setjmp(png_jmpbuf(png))) {
        png_destroy_read_struct(&png, &info, nullptr);
        fclose(f);
        return 3;
    }
    png_init_io(png, f);
    png_read_info(png, info);
    int w = static_cast<int>(png_get_image_width(png, info));
    int h = static_cast<int>(png_get_image_height(png, info));
    png_byte color = png_get_color_type(png, info);
    png_byte depth = png_get_bit_depth(png, info);

    if (depth == 16) png_set_strip_16(png);
    if (label_canvas) {
        // Labels: keep single channel; expand palette to its index? No —
        // palette PNGs (VOC) store class ids as palette indices, which is
        // exactly what we want: read raw indices via PNG_TRANSFORM none.
        if (color == PNG_COLOR_TYPE_GRAY && depth < 8) png_set_packing(png);
    } else {
        if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
        if (color == PNG_COLOR_TYPE_GRAY || color == PNG_COLOR_TYPE_GRAY_ALPHA)
            png_set_gray_to_rgb(png);
        if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
        if (color & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
    }
    png_read_update_info(png, info);
    const size_t rowbytes = png_get_rowbytes(png, info);
    std::vector<uint8_t> row(rowbytes);
    const int copy_w = w < cw ? w : cw;
    for (int y = 0; y < h; ++y) {
        png_read_row(png, row.data(), nullptr);
        if (y >= ch) continue;
        if (label_canvas) {
            int32_t* dst = label_canvas + static_cast<size_t>(y) * cw;
            for (int x = 0; x < copy_w; ++x) dst[x] = row[x];
        } else {
            std::memcpy(canvas + (static_cast<size_t>(y) * cw) * 3, row.data(),
                        static_cast<size_t>(copy_w) * 3);
        }
    }
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(f);
    *out_h = h < ch ? h : ch;
    *out_w = copy_w;
    return 0;
}

bool has_suffix(const char* s, const char* suf) {
    size_t ls = std::strlen(s), lf = std::strlen(suf);
    return ls >= lf && std::strcmp(s + ls - lf, suf) == 0;
}

}  // namespace

extern "C" {

int ssseg_decode_image(const char* path, uint8_t* canvas, int canvas_h,
                       int canvas_w, int* out_hw) {
    int h = 0, w = 0, rc;
    if (has_suffix(path, ".jpg") || has_suffix(path, ".jpeg") ||
        has_suffix(path, ".JPG") || has_suffix(path, ".JPEG")) {
        rc = decode_jpeg_into(path, canvas, canvas_h, canvas_w, &h, &w);
    } else {
        rc = decode_png_into(path, canvas, nullptr, canvas_h, canvas_w, &h, &w);
    }
    out_hw[0] = h;
    out_hw[1] = w;
    return rc;
}

int ssseg_decode_label(const char* path, int32_t* canvas, int canvas_h,
                       int canvas_w, int* out_hw) {
    int h = 0, w = 0;
    int rc = decode_png_into(path, nullptr, canvas, canvas_h, canvas_w, &h, &w);
    out_hw[0] = h;
    out_hw[1] = w;
    return rc;
}

// Batch decode with a thread pool: images[i] -> canvases + sizes.
// canvases: (n, canvas_h, canvas_w, 3) uint8; sizes: (n, 2) int32.
int ssseg_decode_batch(const char** paths, int n, uint8_t* canvases,
                       int canvas_h, int canvas_w, int32_t* sizes,
                       int num_threads) {
    std::atomic<int> next(0);
    std::atomic<int> err(0);
    const size_t slot = static_cast<size_t>(canvas_h) * canvas_w * 3;
    auto work = [&]() {
        for (;;) {
            int i = next.fetch_add(1);
            if (i >= n) return;
            int hw[2] = {0, 0};
            int rc = ssseg_decode_image(paths[i], canvases + slot * i,
                                        canvas_h, canvas_w, hw);
            if (rc != 0) err.store(rc);
            sizes[2 * i] = hw[0];
            sizes[2 * i + 1] = hw[1];
        }
    };
    if (num_threads <= 1) {
        work();
    } else {
        std::vector<std::thread> ts;
        for (int t = 0; t < num_threads; ++t) ts.emplace_back(work);
        for (auto& t : ts) t.join();
    }
    return err.load();
}

}  // extern "C"

// Native image decode + resize for the host-side data path.
//
// The reference leaned on OpenCV/PIL for every image touch
// (crop_face.py, find_embedding.py, datasets). Feeding a TPU means the
// host must decode+resize faster than the chip consumes; this file
// provides JPEG (libjpeg) and PNG (libpng) decoding to RGB8 plus a
// bilinear resize, exported with a plain C ABI for ctypes.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <csetjmp>

#include <jpeglib.h>
#include <png.h>

extern "C" {

void vn_free(void* p) { free(p); }

// ---------------------------------------------------------------------
// JPEG
// ---------------------------------------------------------------------

struct VnJpegErr {
    jpeg_error_mgr pub;
    jmp_buf jump;
};

static void vn_jpeg_error_exit(j_common_ptr cinfo) {
    VnJpegErr* err = reinterpret_cast<VnJpegErr*>(cinfo->err);
    longjmp(err->jump, 1);
}

static uint8_t* decode_jpeg(const uint8_t* bytes, size_t len, int* w,
                            int* h) {
    jpeg_decompress_struct cinfo;
    VnJpegErr jerr;
    cinfo.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = vn_jpeg_error_exit;
    uint8_t* out = nullptr;
    if (setjmp(jerr.jump)) {
        jpeg_destroy_decompress(&cinfo);
        free(out);
        return nullptr;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_mem_src(&cinfo, bytes, len);
    if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
        jpeg_destroy_decompress(&cinfo);
        return nullptr;
    }
    cinfo.out_color_space = JCS_RGB;
    jpeg_start_decompress(&cinfo);
    *w = cinfo.output_width;
    *h = cinfo.output_height;
    size_t stride = static_cast<size_t>(*w) * 3;
    out = static_cast<uint8_t*>(malloc(stride * *h));
    while (cinfo.output_scanline < cinfo.output_height) {
        uint8_t* row = out + stride * cinfo.output_scanline;
        jpeg_read_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return out;
}

// ---------------------------------------------------------------------
// PNG
// ---------------------------------------------------------------------

struct PngReadCtx {
    const uint8_t* data;
    size_t len;
    size_t pos;
};

static void png_read_fn(png_structp png, png_bytep out, png_size_t n) {
    PngReadCtx* ctx = static_cast<PngReadCtx*>(png_get_io_ptr(png));
    if (ctx->pos + n > ctx->len) {
        png_error(png, "png: read past end");
        return;
    }
    memcpy(out, ctx->data + ctx->pos, n);
    ctx->pos += n;
}

static uint8_t* decode_png(const uint8_t* bytes, size_t len, int* w,
                           int* h) {
    if (len < 8 || png_sig_cmp(bytes, 0, 8)) return nullptr;
    png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING,
                                             nullptr, nullptr, nullptr);
    if (!png) return nullptr;
    png_infop info = png_create_info_struct(png);
    if (!info) {
        png_destroy_read_struct(&png, nullptr, nullptr);
        return nullptr;
    }
    uint8_t* out = nullptr;
    png_bytep* rows = nullptr;
    if (setjmp(png_jmpbuf(png))) {
        png_destroy_read_struct(&png, &info, nullptr);
        free(out);
        free(rows);
        return nullptr;
    }
    PngReadCtx ctx{bytes, len, 0};
    png_set_read_fn(png, &ctx, png_read_fn);
    png_read_info(png, info);

    png_uint_32 width = png_get_image_width(png, info);
    png_uint_32 height = png_get_image_height(png, info);
    int color = png_get_color_type(png, info);
    int depth = png_get_bit_depth(png, info);

    if (depth == 16) png_set_strip_16(png);
    if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
    if (color == PNG_COLOR_TYPE_GRAY && depth < 8)
        png_set_expand_gray_1_2_4_to_8(png);
    if (png_get_valid(png, info, PNG_INFO_tRNS))
        png_set_tRNS_to_alpha(png);
    if (color == PNG_COLOR_TYPE_GRAY ||
        color == PNG_COLOR_TYPE_GRAY_ALPHA)
        png_set_gray_to_rgb(png);
    png_set_strip_alpha(png);
    png_read_update_info(png, info);

    *w = static_cast<int>(width);
    *h = static_cast<int>(height);
    size_t stride = static_cast<size_t>(width) * 3;
    out = static_cast<uint8_t*>(malloc(stride * height));
    rows = static_cast<png_bytep*>(malloc(sizeof(png_bytep) * height));
    for (png_uint_32 y = 0; y < height; ++y) rows[y] = out + stride * y;
    png_read_image(png, rows);
    png_read_end(png, nullptr);
    png_destroy_read_struct(&png, &info, nullptr);
    free(rows);
    return out;
}

// ---------------------------------------------------------------------
// Public API
// ---------------------------------------------------------------------

// Decode JPEG/PNG bytes to RGB8. Returns malloc'd buffer (vn_free) or
// nullptr. Format sniffed from magic bytes.
uint8_t* vn_decode_image(const uint8_t* bytes, size_t len, int* w,
                         int* h) {
    if (len >= 2 && bytes[0] == 0xFF && bytes[1] == 0xD8)
        return decode_jpeg(bytes, len, w, h);
    if (len >= 8 && !png_sig_cmp(bytes, 0, 8))
        return decode_png(bytes, len, w, h);
    // try both as a fallback
    uint8_t* out = decode_jpeg(bytes, len, w, h);
    if (out) return out;
    return decode_png(bytes, len, w, h);
}

// Bilinear resize RGB8 -> RGB8 (caller owns dst of tw*th*3).
void vn_resize_bilinear(const uint8_t* src, int sw, int sh, uint8_t* dst,
                        int tw, int th) {
    const float sx = static_cast<float>(sw) / tw;
    const float sy = static_cast<float>(sh) / th;
    for (int y = 0; y < th; ++y) {
        float fy = (y + 0.5f) * sy - 0.5f;
        if (fy < 0) fy = 0;
        int y0 = static_cast<int>(fy);
        int y1 = y0 + 1 < sh ? y0 + 1 : sh - 1;
        float wy = fy - y0;
        for (int x = 0; x < tw; ++x) {
            float fx = (x + 0.5f) * sx - 0.5f;
            if (fx < 0) fx = 0;
            int x0 = static_cast<int>(fx);
            int x1 = x0 + 1 < sw ? x0 + 1 : sw - 1;
            float wx = fx - x0;
            for (int c = 0; c < 3; ++c) {
                float top = src[(y0 * sw + x0) * 3 + c] * (1 - wx) +
                            src[(y0 * sw + x1) * 3 + c] * wx;
                float bot = src[(y1 * sw + x0) * 3 + c] * (1 - wx) +
                            src[(y1 * sw + x1) * 3 + c] * wx;
                float v = top * (1 - wy) + bot * wy;
                dst[(y * tw + x) * 3 + c] =
                    static_cast<uint8_t>(v + 0.5f);
            }
        }
    }
}

// Convenience: decode a file and resize into caller buffer.
// Returns 0 on success.
int vn_decode_file(const char* path, int tw, int th, uint8_t* dst) {
    FILE* fp = fopen(path, "rb");
    if (!fp) return -1;
    fseek(fp, 0, SEEK_END);
    long len = ftell(fp);
    fseek(fp, 0, SEEK_SET);
    uint8_t* bytes = static_cast<uint8_t*>(malloc(len));
    size_t rd = fread(bytes, 1, len, fp);
    fclose(fp);
    if (rd != static_cast<size_t>(len)) {
        free(bytes);
        return -2;
    }
    int w = 0, h = 0;
    uint8_t* img = vn_decode_image(bytes, len, &w, &h);
    free(bytes);
    if (!img) return -3;
    if (w == tw && h == th) {
        memcpy(dst, img, static_cast<size_t>(tw) * th * 3);
    } else {
        vn_resize_bilinear(img, w, h, dst, tw, th);
    }
    free(img);
    return 0;
}

}  // extern "C"

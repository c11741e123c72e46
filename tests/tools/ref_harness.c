/* Conformance harness: drives the REFERENCE decoder (compiled from
 * /root/reference/src at test time) without SDL, and dumps its exact
 * outputs for byte-for-byte comparison with this engine's oracle.
 *
 * This file is part of jpeg_decoder_tpu's test suite; it only *links*
 * against the reference's objects. Output format (little-endian):
 *   u32 ncs, u32 X, u32 Y, u32 precision
 *   per component: u32 rows, u32 stride, then rows*stride bytes (plane)
 *   u32 has_rgb; if 1: Y*X*3 bytes RGB24 (pitch = 3*X)
 *
 * Reference entry points used: decode_jpeg_buffer (decode.h),
 * y_rgb/ycbcr_rgb/yccb_rgb (colour_conversion.h).
 */
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "colour_conversion.h"
#include "decode.h"
#include "frame_header.h"

static void wu32(FILE *f, uint32_t v) { fwrite(&v, 4, 1, f); }

int main(int argc, char **argv) {
    if (argc < 3) {
        fprintf(stderr, "usage: %s in.jpg out.bin\n", argv[0]);
        return 2;
    }
    FILE *in = fopen(argv[1], "rb");
    if (!in) { perror("open"); return 2; }
    fseek(in, 0, SEEK_END);
    long len = ftell(in);
    fseek(in, 0, SEEK_SET);
    /* Pad the tail: the reference reads a few bytes past the end during
     * marker lookahead (no bounds checks). */
    uint8_t *buf = calloc(len + 16, 1);
    if (fread(buf, 1, len, in) != (size_t)len) { perror("read"); return 2; }
    fclose(in);

    FrameHeader fh;
    fh.process = -1;
    Image *img = NULL;
    if (decode_jpeg_buffer(buf, len, &fh, &img) != 0 || !img) {
        fprintf(stderr, "reference decode failed\n");
        return 1;
    }

    FILE *out = fopen(argv[2], "wb");
    if (!out) { perror("open out"); return 2; }
    wu32(out, fh.ncs);
    wu32(out, fh.X);
    wu32(out, fh.Y);
    wu32(out, fh.precision);
    for (int i = 0; i < fh.ncs; i++) {
        Component *c = fh.cs + i;
        uint16_t x_to_mcu = c->x
            + ((c->x % (8 * c->hsf)) ? (8 * c->hsf - (c->x % (8 * c->hsf))) : 0);
        uint16_t y_to_mcu = c->y
            + ((c->y % (8 * c->vsf)) ? (8 * c->vsf - (c->y % (8 * c->vsf))) : 0);
        wu32(out, y_to_mcu);
        wu32(out, x_to_mcu);
        fwrite(img->buf[i], 1, (size_t)x_to_mcu * y_to_mcu, out);
    }

    uint16_t pitch = fh.X * 3;
    uint8_t *pixels = calloc((size_t)fh.Y * pitch, 1);
    int has_rgb = 1;
    if (fh.ncs == 1) {
        y_rgb(&fh, img, pixels, fh.X, fh.Y, pitch);
    } else if (fh.ncs == 3) {
        ycbcr_rgb(&fh, img, pixels, fh.X, fh.Y, pitch);
    } else if (fh.ncs == 4) {
        yccb_rgb(&fh, img, pixels, fh.X, fh.Y, pitch);
    } else {
        has_rgb = 0;
    }
    wu32(out, has_rgb);
    if (has_rgb) {
        fwrite(pixels, 1, (size_t)fh.Y * pitch, out);
    }
    fclose(out);
    free(pixels);
    free_img(img);
    free(buf);
    return 0;
}

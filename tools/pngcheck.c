/* Cross-validation harness for the pure-Python PNG decoder
 * (journal_batch_processer_spark/operators/multimodal.py): drives the
 * system libpng as an INDEPENDENT reference implementation.
 *
 * Modes:
 *   decode <in.png>
 *       prints "W H 3" then one line per row of RGB8 samples
 *       (palette/gray expanded to RGB, 16-bit stripped).
 *   decode16 <in.png>
 *       same but WITHOUT 16-bit stripping: RGB16 samples (8-bit
 *       inputs print their 8-bit values scaled by libpng's expand).
 *   encode <w> <h> <seed> <type:rgb|rgba|gray|pal|pal4> <interlace:0|1> <out.png>
 *       writes a deterministic LCG-pattern PNG via libpng — the
 *       third-party bitstreams our decoder must read.
 *
 * Built on demand by tests/test_png_crossval.py; tests skip when the
 * toolchain is absent.
 */
#include <png.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

static unsigned lcg(unsigned *s) {
  *s = *s * 1103515245u + 12345u;
  return (*s >> 16) & 0xFF;
}

static int do_decode16(const char *path) {
  FILE *f = fopen(path, "rb");
  if (!f) { fprintf(stderr, "open failed\n"); return 2; }
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, NULL,
                                           NULL, NULL);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, NULL);
    fclose(f);
    return 3;
  }
  png_init_io(png, f);
  png_read_png(png, info,
               PNG_TRANSFORM_EXPAND | PNG_TRANSFORM_STRIP_ALPHA |
               PNG_TRANSFORM_GRAY_TO_RGB,
               NULL);
  png_uint_32 w = png_get_image_width(png, info);
  png_uint_32 h = png_get_image_height(png, info);
  int depth = png_get_bit_depth(png, info);
  png_bytepp rows = png_get_rows(png, info);
  printf("%u %u 3 %d\n", (unsigned)w, (unsigned)h, depth);
  for (png_uint_32 y = 0; y < h; y++) {
    for (png_uint_32 x = 0; x < w * 3; x++) {
      int v = depth == 16 ? (rows[y][2 * x] << 8) | rows[y][2 * x + 1]
                          : rows[y][x];
      printf(x ? " %d" : "%d", v);
    }
    printf("\n");
  }
  png_destroy_read_struct(&png, &info, NULL);
  fclose(f);
  return 0;
}

static int do_decode(const char *path) {
  FILE *f = fopen(path, "rb");
  if (!f) { fprintf(stderr, "open failed\n"); return 2; }
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, NULL,
                                           NULL, NULL);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, NULL);
    fclose(f);
    return 3;
  }
  png_init_io(png, f);
  png_read_png(png, info,
               PNG_TRANSFORM_STRIP_16 | PNG_TRANSFORM_EXPAND |
               PNG_TRANSFORM_STRIP_ALPHA | PNG_TRANSFORM_GRAY_TO_RGB,
               NULL);
  png_uint_32 w = png_get_image_width(png, info);
  png_uint_32 h = png_get_image_height(png, info);
  png_bytepp rows = png_get_rows(png, info);
  printf("%u %u 3\n", (unsigned)w, (unsigned)h);
  for (png_uint_32 y = 0; y < h; y++) {
    for (png_uint_32 x = 0; x < w * 3; x++)
      printf(x ? " %d" : "%d", rows[y][x]);
    printf("\n");
  }
  png_destroy_read_struct(&png, &info, NULL);
  fclose(f);
  return 0;
}

static int do_encode(int w, int h, unsigned seed, const char *type,
                     int interlace, const char *path) {
  FILE *f = fopen(path, "wb");
  if (!f) { fprintf(stderr, "open failed\n"); return 2; }
  png_structp png = png_create_write_struct(PNG_LIBPNG_VER_STRING, NULL,
                                            NULL, NULL);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_write_struct(&png, &info);
    fclose(f);
    return 3;
  }
  png_init_io(png, f);
  int ct, depth = 8, ch;
  if (!strcmp(type, "rgb")) { ct = PNG_COLOR_TYPE_RGB; ch = 3; }
  else if (!strcmp(type, "rgba")) { ct = PNG_COLOR_TYPE_RGBA; ch = 4; }
  else if (!strcmp(type, "gray")) { ct = PNG_COLOR_TYPE_GRAY; ch = 1; }
  else if (!strcmp(type, "gray16")) {
    ct = PNG_COLOR_TYPE_GRAY; ch = 1; depth = 16;
  }
  else if (!strcmp(type, "rgb16")) {
    ct = PNG_COLOR_TYPE_RGB; ch = 3; depth = 16;
  }
  else if (!strcmp(type, "ga")) {
    ct = PNG_COLOR_TYPE_GRAY_ALPHA; ch = 2;
  }
  else if (!strcmp(type, "pal")) { ct = PNG_COLOR_TYPE_PALETTE; ch = 1; }
  else if (!strcmp(type, "pal4")) {
    ct = PNG_COLOR_TYPE_PALETTE; ch = 1; depth = 4;
  }
  else { fprintf(stderr, "bad type\n"); return 4; }
  png_set_IHDR(png, info, w, h, depth, ct,
               interlace ? PNG_INTERLACE_ADAM7 : PNG_INTERLACE_NONE,
               PNG_COMPRESSION_TYPE_DEFAULT, PNG_FILTER_TYPE_DEFAULT);
  png_color pal[16];
  int npal = depth == 4 ? 16 : 16;
  if (ct == PNG_COLOR_TYPE_PALETTE) {
    unsigned s = seed ^ 0xBEEF;
    for (int i = 0; i < npal; i++) {
      pal[i].red = lcg(&s);
      pal[i].green = lcg(&s);
      pal[i].blue = lcg(&s);
    }
    png_set_PLTE(png, info, pal, npal);
  }
  png_write_info(png, info);
  int stride = (w * ch * depth + 7) / 8;
  png_bytep *rows = malloc(sizeof(png_bytep) * h);
  unsigned s = seed;
  for (int y = 0; y < h; y++) {
    rows[y] = malloc(stride);
    if (depth == 16) {
      for (int x = 0; x < w * ch; x++) {
        rows[y][2 * x] = lcg(&s);
        rows[y][2 * x + 1] = lcg(&s);
      }
    } else if (depth == 8) {
      for (int x = 0; x < w * ch; x++)
        rows[y][x] = ct == PNG_COLOR_TYPE_PALETTE ? lcg(&s) % npal
                                                  : lcg(&s);
    } else { /* 4-bit palette, two pixels per byte */
      memset(rows[y], 0, stride);
      for (int x = 0; x < w; x++) {
        int v = lcg(&s) % npal;
        rows[y][x / 2] |= v << (x % 2 ? 0 : 4);
      }
    }
  }
  /* let libpng pick per-row adaptive filters AND do Adam7 splitting */
  png_write_image(png, rows);
  png_write_end(png, info);
  for (int y = 0; y < h; y++) free(rows[y]);
  free(rows);
  png_destroy_write_struct(&png, &info);
  fclose(f);
  return 0;
}

int main(int argc, char **argv) {
  if (argc >= 3 && !strcmp(argv[1], "decode"))
    return do_decode(argv[2]);
  if (argc >= 3 && !strcmp(argv[1], "decode16"))
    return do_decode16(argv[2]);
  if (argc >= 8 && !strcmp(argv[1], "encode"))
    return do_encode(atoi(argv[2]), atoi(argv[3]),
                     (unsigned)atoi(argv[4]), argv[5], atoi(argv[6]),
                     argv[7]);
  fprintf(stderr,
          "usage: pngcheck decode <in.png>\n"
          "       pngcheck encode <w> <h> <seed> "
          "<rgb|rgba|gray|pal|pal4> <interlace> <out.png>\n");
  return 1;
}

/* Cross-validation harness for the pure-Python JPEG codec
 * (journal_batch_processer_spark/operators/jpeg.py): drives the
 * system libjpeg as an INDEPENDENT reference implementation.
 *
 * Modes:
 *   decode <in.jpg>
 *       prints "W H NCOMP" then one line per pixel row of
 *       space-separated samples (interleaved components).
 *   encode <w> <h> <gray> <arith:0|1> <out.jpg>
 *       writes a solid-gray RGB JPEG via libjpeg; arith=1 requests
 *       arithmetic entropy coding (SOF9/SOF10) — the third-party
 *       bitstream our Python QM decoder must read.
 *
 * Built on demand by tests/test_jpeg_crossval.py (gcc + jpeglib are
 * present in this container; the tests skip cleanly when absent).
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <setjmp.h>
#include <jpeglib.h>

struct err_mgr {
  struct jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

static void err_exit(j_common_ptr cinfo) {
  struct err_mgr *err = (struct err_mgr *)cinfo->err;
  (*cinfo->err->output_message)(cinfo);
  longjmp(err->setjmp_buffer, 1);
}

static int do_decode(const char *path) {
  FILE *f = fopen(path, "rb");
  if (!f) { fprintf(stderr, "open failed\n"); return 2; }
  struct jpeg_decompress_struct cinfo;
  struct err_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = err_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return 3;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  jpeg_start_decompress(&cinfo);
  int w = cinfo.output_width, h = cinfo.output_height,
      nc = cinfo.output_components;
  printf("%d %d %d\n", w, h, nc);
  JSAMPARRAY buf = (*cinfo.mem->alloc_sarray)((j_common_ptr)&cinfo,
      JPOOL_IMAGE, (JDIMENSION)(w * nc), 1);
  while (cinfo.output_scanline < cinfo.output_height) {
    jpeg_read_scanlines(&cinfo, buf, 1);
    for (int x = 0; x < w * nc; x++)
      printf(x ? " %d" : "%d", buf[0][x]);
    printf("\n");
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return 0;
}

static int do_encode(int w, int h, int gray, int arith, const char *path) {
  FILE *f = fopen(path, "wb");
  if (!f) { fprintf(stderr, "open failed\n"); return 2; }
  struct jpeg_compress_struct cinfo;
  struct err_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = err_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_compress(&cinfo);
    fclose(f);
    return 3;
  }
  jpeg_create_compress(&cinfo);
  jpeg_stdio_dest(&cinfo, f);
  cinfo.image_width = w;
  cinfo.image_height = h;
  cinfo.input_components = 3;
  cinfo.in_color_space = JCS_RGB;
  jpeg_set_defaults(&cinfo);
  jpeg_set_quality(&cinfo, 100, TRUE);
  /* 4:4:4 so the Python decoder's solid-image contract holds */
  for (int i = 0; i < 3; i++) {
    cinfo.comp_info[i].h_samp_factor = 1;
    cinfo.comp_info[i].v_samp_factor = 1;
  }
#ifdef C_ARITH_CODING_SUPPORTED
  cinfo.arith_code = arith ? TRUE : FALSE;
#else
  if (arith) { fprintf(stderr, "no arith support\n"); return 4; }
#endif
  jpeg_start_compress(&cinfo, TRUE);
  JSAMPLE *row = malloc((size_t)w * 3);
  memset(row, gray, (size_t)w * 3);
  JSAMPROW rp[1] = {row};
  while (cinfo.next_scanline < cinfo.image_height)
    jpeg_write_scanlines(&cinfo, rp, 1);
  free(row);
  jpeg_finish_compress(&cinfo);
  jpeg_destroy_compress(&cinfo);
  fclose(f);
  return 0;
}

/* Deterministic LCG noise image: exercises every entropy path with a
 * non-trivial coefficient distribution. */
static int do_encode_noise(int w, int h, unsigned seed, int arith,
                           int progressive, int restart,
                           const char *path) {
  FILE *f = fopen(path, "wb");
  if (!f) { fprintf(stderr, "open failed\n"); return 2; }
  struct jpeg_compress_struct cinfo;
  struct err_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = err_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_compress(&cinfo);
    fclose(f);
    return 3;
  }
  jpeg_create_compress(&cinfo);
  jpeg_stdio_dest(&cinfo, f);
  cinfo.image_width = w;
  cinfo.image_height = h;
  cinfo.input_components = 3;
  cinfo.in_color_space = JCS_RGB;
  jpeg_set_defaults(&cinfo);
  jpeg_set_quality(&cinfo, 85, TRUE);
  for (int i = 0; i < 3; i++) {
    cinfo.comp_info[i].h_samp_factor = 1;
    cinfo.comp_info[i].v_samp_factor = 1;
  }
#ifdef C_ARITH_CODING_SUPPORTED
  cinfo.arith_code = arith ? TRUE : FALSE;
#else
  if (arith) { fprintf(stderr, "no arith support\n"); return 4; }
#endif
  if (progressive)
    jpeg_simple_progression(&cinfo);
  cinfo.restart_interval = restart;
  jpeg_start_compress(&cinfo, TRUE);
  JSAMPLE *row = malloc((size_t)w * 3);
  JSAMPROW rp[1] = {row};
  unsigned s = seed;
  while (cinfo.next_scanline < cinfo.image_height) {
    for (int x = 0; x < w * 3; x++) {
      s = s * 1103515245u + 12345u;
      row[x] = (JSAMPLE)((s >> 16) & 0xFF);
    }
    jpeg_write_scanlines(&cinfo, rp, 1);
  }
  free(row);
  jpeg_finish_compress(&cinfo);
  jpeg_destroy_compress(&cinfo);
  fclose(f);
  return 0;
}

/* Dump QUANTIZED DCT coefficients (entropy-layer truth: exact, no
 * IDCT rounding) — one line per block: "comp by bx c0..c63" in
 * natural (row-major) order. */
static int do_coef(const char *path) {
  FILE *f = fopen(path, "rb");
  if (!f) { fprintf(stderr, "open failed\n"); return 2; }
  struct jpeg_decompress_struct cinfo;
  struct err_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = err_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return 3;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  jvirt_barray_ptr *coefs = jpeg_read_coefficients(&cinfo);
  static const int natorder[64] = {
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
  };
  (void)natorder; /* libjpeg stores blocks already in natural order */
  for (int ci = 0; ci < cinfo.num_components; ci++) {
    jpeg_component_info *comp = &cinfo.comp_info[ci];
    for (JDIMENSION by = 0; by < comp->height_in_blocks; by++) {
      JBLOCKARRAY rows = (*cinfo.mem->access_virt_barray)(
          (j_common_ptr)&cinfo, coefs[ci], by, 1, FALSE);
      for (JDIMENSION bx = 0; bx < comp->width_in_blocks; bx++) {
        printf("%d %u %u", ci, by, bx);
        for (int k = 0; k < 64; k++)
          printf(" %d", rows[0][bx][k]);
        printf("\n");
      }
    }
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return 0;
}

int main(int argc, char **argv) {
  if (argc >= 3 && !strcmp(argv[1], "decode"))
    return do_decode(argv[2]);
  if (argc >= 3 && !strcmp(argv[1], "coef"))
    return do_coef(argv[2]);
  if (argc >= 7 && !strcmp(argv[1], "encode"))
    return do_encode(atoi(argv[2]), atoi(argv[3]), atoi(argv[4]),
                     atoi(argv[5]), argv[6]);
  if (argc >= 7 && !strcmp(argv[1], "encode_noise"))
    return do_encode_noise(atoi(argv[2]), atoi(argv[3]),
                           (unsigned)atoi(argv[4]), atoi(argv[5]),
                           argc >= 8 ? atoi(argv[6]) : 0,
                           argc >= 9 ? atoi(argv[7]) : 0,
                           argv[argc - 1]);
  fprintf(stderr,
          "usage: jpegcheck decode|coef <in.jpg>\n"
          "       jpegcheck encode <w> <h> <gray> <arith> <out.jpg>\n"
          "       jpegcheck encode_noise <w> <h> <seed> <arith> <out.jpg>\n");
  return 1;
}

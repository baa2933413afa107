/* x264 fixture encoder: independent-provenance H.264 intra streams for
 * golden tests (VERDICT r2 item 6: every prior fixture came from the
 * repo's own Python encoders).
 *
 * Encodes deterministic synthetic frames with libx264 via libavcodec,
 * all-IDR, in-band parameter sets, deblocking disabled (neither the
 * reference decoder nor this framework applies the loop filter, so the
 * encoder's reconstruction must not either for bit-exact comparison).
 *
 * Usage: x264_fixture <out.264> <w> <h> <frames> <qp> <cabac 0|1>
 *        <dct8 0|1> <seed> [slices] [noise_mask]
 * noise_mask (default 31) scales the per-pixel noise; lower values give
 * natural-content-like bitrates (31 -> worst-case dense residuals).
 * slices > 1 splits every picture into that many slices (x264
 * slices=N), the axis the host entropy stage parallelizes within a
 * frame (slices are entropy-independent, h264_slice.c:1013-1139).
 * Build: gcc -O2 tools/x264_fixture.c -o /tmp/x264_fixture \
 *            -lavcodec -lavutil
 */

#include <libavcodec/avcodec.h>
#include <libavutil/opt.h>
#include <libavutil/imgutils.h>
#include <stdio.h>
#include <stdlib.h>

static uint32_t lcg;
static uint8_t rnd8(void) {
  lcg = lcg * 1664525u + 1013904223u;
  return (uint8_t)(lcg >> 24);
}

int main(int argc, char** argv) {
  if (argc < 9) {
    fprintf(stderr,
            "usage: %s out w h frames qp cabac dct8 seed\n", argv[0]);
    return 2;
  }
  const char* out_path = argv[1];
  int w = atoi(argv[2]), h = atoi(argv[3]), nframes = atoi(argv[4]);
  int qp = atoi(argv[5]), cabac = atoi(argv[6]), dct8 = atoi(argv[7]);
  lcg = (uint32_t)atoi(argv[8]) * 2654435761u + 1u;
  int slices = argc > 9 ? atoi(argv[9]) : 1;
  int noise = argc > 10 ? atoi(argv[10]) : 31;

  const AVCodec* codec = avcodec_find_encoder_by_name("libx264");
  if (!codec) { fprintf(stderr, "libx264 unavailable\n"); return 3; }
  AVCodecContext* c = avcodec_alloc_context3(codec);
  c->width = w;
  c->height = h;
  c->time_base = (AVRational){1, 25};
  c->pix_fmt = AV_PIX_FMT_YUV420P;
  c->gop_size = 1;                        /* every frame an IDR */
  c->max_b_frames = 0;
  c->thread_count = 1;
  char params[256];
  /* constant QP (aq off), no deblock, all-intra, deterministic */
  snprintf(params, sizeof params,
           "qp=%d:aq-mode=0:no-deblock=1:keyint=1:min-keyint=1:"
           "cabac=%d:8x8dct=%d:threads=1:sliced-threads=0:"
           "scenecut=0:repeat-headers=1:slices=%d",
           qp, cabac, dct8, slices > 1 ? slices : 1);
  av_opt_set(c->priv_data, "x264-params", params, 0);
  if (avcodec_open2(c, codec, NULL) < 0) {
    fprintf(stderr, "encoder open failed\n");
    return 3;
  }

  FILE* f = fopen(out_path, "wb");
  if (!f) return 2;
  AVFrame* frame = av_frame_alloc();
  frame->format = c->pix_fmt;
  frame->width = w;
  frame->height = h;
  av_frame_get_buffer(frame, 0);
  AVPacket* pkt = av_packet_alloc();

  for (int i = 0; i < nframes; i++) {
    av_frame_make_writable(frame);
    /* smooth gradients + blocky noise: exercises every intra mode */
    for (int y = 0; y < h; y++)
      for (int x = 0; x < w; x++)
        frame->data[0][y * frame->linesize[0] + x] =
            (uint8_t)((x * 3 + y * 2 + i * 17 + (rnd8() & noise)) & 0xFF);
    for (int y = 0; y < h / 2; y++)
      for (int x = 0; x < w / 2; x++) {
        frame->data[1][y * frame->linesize[1] + x] =
            (uint8_t)(128 + ((x - y + i) & 63) - 32
                      + (rnd8() & (noise / 2)));
        frame->data[2][y * frame->linesize[2] + x] =
            (uint8_t)(128 + ((x + y * 2 - i) & 63) - 32
                      + (rnd8() & (noise / 2)));
      }
    frame->pts = i;
    if (avcodec_send_frame(c, frame) < 0) return 4;
    while (avcodec_receive_packet(c, pkt) == 0) {
      fwrite(pkt->data, 1, pkt->size, f);
      av_packet_unref(pkt);
    }
  }
  avcodec_send_frame(c, NULL);
  while (avcodec_receive_packet(c, pkt) == 0) {
    fwrite(pkt->data, 1, pkt->size, f);
    av_packet_unref(pkt);
  }
  /* the reference's ES scanner ignores NALUs within 32 bytes of EOF
   * (esparser.c:65); pad with a filler NALU like the Python fixtures */
  const uint8_t filler[40] = {0, 0, 0, 1, 0x0c, 0x80};
  fwrite(filler, 1, sizeof filler, f);
  fclose(f);
  av_packet_free(&pkt);
  av_frame_free(&frame);
  avcodec_free_context(&c);
  return 0;
}

/* Independent golden oracle: decode an Annex-B H.264 stream with
 * libavcodec's (full, conforming) h264 decoder and dump raw planar
 * YUV420 frames to a file — used by tests/test_golden_x264.py to pin
 * this framework's output against a decoder with completely separate
 * provenance.
 *
 * Usage: h264_lavc_decode <in.264> <out.yuv>
 * Build: gcc -O2 tools/h264_lavc_decode.c -o /tmp/h264_lavc_decode \
 *            -lavcodec -lavutil
 */

#include <libavcodec/avcodec.h>
#include <stdio.h>
#include <stdlib.h>

static void dump(AVFrame* fr, FILE* f) {
  for (int y = 0; y < fr->height; y++)
    fwrite(fr->data[0] + y * fr->linesize[0], 1, fr->width, f);
  for (int p = 1; p < 3; p++)
    for (int y = 0; y < fr->height / 2; y++)
      fwrite(fr->data[p] + y * fr->linesize[p], 1, fr->width / 2, f);
}

int main(int argc, char** argv) {
  if (argc < 3) { fprintf(stderr, "usage: %s in out\n", argv[0]); return 2; }
  FILE* fi = fopen(argv[1], "rb");
  if (!fi) return 2;
  fseek(fi, 0, SEEK_END);
  long n = ftell(fi);
  fseek(fi, 0, SEEK_SET);
  uint8_t* buf = malloc(n + AV_INPUT_BUFFER_PADDING_SIZE);
  if (fread(buf, 1, n, fi) != (size_t)n) return 2;
  memset(buf + n, 0, AV_INPUT_BUFFER_PADDING_SIZE);
  fclose(fi);

  const AVCodec* codec = avcodec_find_decoder(AV_CODEC_ID_H264);
  AVCodecContext* c = avcodec_alloc_context3(codec);
  c->thread_count = 1;
  if (avcodec_open2(c, codec, NULL) < 0) return 3;
  AVCodecParserContext* parser = av_parser_init(AV_CODEC_ID_H264);
  AVPacket* pkt = av_packet_alloc();
  AVFrame* fr = av_frame_alloc();
  FILE* fo = fopen(argv[2], "wb");
  int count = 0;

  uint8_t* p = buf;
  long left = n;
  while (left > 0) {
    int used = av_parser_parse2(parser, c, &pkt->data, &pkt->size,
                                p, (int)left, AV_NOPTS_VALUE,
                                AV_NOPTS_VALUE, 0);
    p += used;
    left -= used;
    if (pkt->size && avcodec_send_packet(c, pkt) == 0)
      while (avcodec_receive_frame(c, fr) == 0) { dump(fr, fo); count++; }
  }
  for (;;) {                              /* flush the parser */
    av_parser_parse2(parser, c, &pkt->data, &pkt->size, NULL, 0,
                     AV_NOPTS_VALUE, AV_NOPTS_VALUE, 0);
    if (!pkt->size) break;
    if (avcodec_send_packet(c, pkt) == 0)
      while (avcodec_receive_frame(c, fr) == 0) { dump(fr, fo); count++; }
  }
  avcodec_send_packet(c, NULL);
  while (avcodec_receive_frame(c, fr) == 0) { dump(fr, fo); count++; }
  fclose(fo);
  fprintf(stderr, "decoded %d frames %dx%d\n", count, c->width, c->height);
  printf("%d %d %d\n", count, c->width, c->height);
  return count > 0 ? 0 : 1;
}

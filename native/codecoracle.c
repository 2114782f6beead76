/* libavcodec encode/decode oracle shim for the codecs DPB layer tests.
 *
 * The reference's gst-libs/gst/codecs decoder base classes
 * (gsth264decoder.c, gsth265decoder.c, gstvp9decoder.c, ...) own POC
 * computation, DPB management and output reordering.  To validate our
 * from-spec reimplementation we need REAL coded streams with known
 * structure (IPPP / B / B-pyramid / multi-ref) and the TRUE output
 * order of a trusted decoder.  This shim drives libavcodec (libx264 /
 * mpeg2video / libvpx encoders; h264 / mpeg2video / vp8 / vp9
 * decoders) the same way tsoracle.c drives libavformat.
 *
 * Blob format produced by encode and consumed by decode_pts:
 *   u32 magic 'CORC' | u32 n_packets
 *   n_packets x { u64 size, i64 pts, i64 dts, u32 flags, u32 pad }
 *   payloads concatenated
 */
#include <libavcodec/avcodec.h>
#include <libavutil/opt.h>
#include <libavutil/dict.h>
#include <libavutil/imgutils.h>
#include <stdint.h>
#include <stdlib.h>
#include <string.h>

#define MAGIC 0x43524f43u      /* 'CORC' little-endian */

typedef struct
{
  uint64_t size;
  int64_t pts;
  int64_t dts;
  uint32_t flags;
  uint32_t pad;
} PktHdr;

typedef struct
{
  uint8_t *data;
  size_t size;
  size_t cap;
} Buf;

static int
buf_put (Buf * b, const void *p, size_t n)
{
  if (b->size + n > b->cap) {
    size_t nc = b->cap ? b->cap * 2 : 65536;
    while (nc < b->size + n)
      nc *= 2;
    uint8_t *nd = realloc (b->data, nc);
    if (!nd)
      return -1;
    b->data = nd;
    b->cap = nc;
  }
  memcpy (b->data + b->size, p, n);
  b->size += n;
  return 0;
}

/* Synthetic frame: moving gradient + block so encoders produce real
 * motion vectors and reference patterns. */
static void
fill_frame (AVFrame * f, int i)
{
  int x, y;
  for (y = 0; y < f->height; y++)
    for (x = 0; x < f->width; x++)
      f->data[0][y * f->linesize[0] + x] =
          (uint8_t) (x + y + i * 3);
  for (y = 0; y < f->height / 2; y++)
    for (x = 0; x < f->width / 2; x++) {
      f->data[1][y * f->linesize[1] + x] = (uint8_t) (128 + x + i * 2);
      f->data[2][y * f->linesize[2] + x] = (uint8_t) (64 + y - i * 2);
    }
  /* moving white block */
  int bx = (i * 7) % (f->width - 16), by = (i * 5) % (f->height - 16);
  for (y = by; y < by + 16; y++)
    memset (f->data[0] + y * f->linesize[0] + bx, 235, 16);
}

static int
drain_packets (AVCodecContext * ctx, AVPacket * pkt, Buf * hdrs, Buf * body,
    uint32_t * count)
{
  int ret;
  while ((ret = avcodec_receive_packet (ctx, pkt)) == 0) {
    PktHdr h = { pkt->size, pkt->pts, pkt->dts,
      (pkt->flags & AV_PKT_FLAG_KEY) ? 1u : 0u, 0
    };
    if (buf_put (hdrs, &h, sizeof (h)) || buf_put (body, pkt->data, pkt->size))
      return -1;
    (*count)++;
    av_packet_unref (pkt);
  }
  return (ret == AVERROR (EAGAIN) || ret == AVERROR_EOF) ? 0 : -1;
}

int
codecoracle_encode (const char *enc_name, const char *opts, int w, int h,
    int n_frames, uint8_t ** out, uint64_t * out_size)
{
  const AVCodec *codec = avcodec_find_encoder_by_name (enc_name);
  AVCodecContext *ctx = NULL;
  AVFrame *frame = NULL;
  AVPacket *pkt = NULL;
  AVDictionary *dict = NULL;
  Buf hdrs = { 0 }, body = { 0 };
  uint32_t count = 0;
  int i, rc = -1;

  if (!codec)
    return -1;
  ctx = avcodec_alloc_context3 (codec);
  if (!ctx)
    return -1;
  ctx->width = w;
  ctx->height = h;
  ctx->time_base = (AVRational) {1, 25};
  ctx->framerate = (AVRational) {25, 1};
  ctx->pix_fmt = AV_PIX_FMT_YUV420P;
  if (opts && *opts)
    if (av_dict_parse_string (&dict, opts, "=", ",", 0) < 0)
      goto done;
  if (avcodec_open2 (ctx, codec, &dict) < 0)
    goto done;
  frame = av_frame_alloc ();
  pkt = av_packet_alloc ();
  if (!frame || !pkt)
    goto done;
  frame->format = ctx->pix_fmt;
  frame->width = w;
  frame->height = h;
  if (av_frame_get_buffer (frame, 0) < 0)
    goto done;

  for (i = 0; i < n_frames; i++) {
    if (av_frame_make_writable (frame) < 0)
      goto done;
    fill_frame (frame, i);
    frame->pts = i;
    if (avcodec_send_frame (ctx, frame) < 0)
      goto done;
    if (drain_packets (ctx, pkt, &hdrs, &body, &count))
      goto done;
  }
  avcodec_send_frame (ctx, NULL);
  if (drain_packets (ctx, pkt, &hdrs, &body, &count))
    goto done;

  {
    uint64_t total = 8 + hdrs.size + body.size;
    uint8_t *blob = malloc (total);
    uint32_t magic = MAGIC;
    if (!blob)
      goto done;
    memcpy (blob, &magic, 4);
    memcpy (blob + 4, &count, 4);
    memcpy (blob + 8, hdrs.data, hdrs.size);
    memcpy (blob + 8 + hdrs.size, body.data, body.size);
    *out = blob;
    *out_size = total;
    rc = 0;
  }

done:
  free (hdrs.data);
  free (body.data);
  av_dict_free (&dict);
  av_frame_free (&frame);
  av_packet_free (&pkt);
  avcodec_free_context (&ctx);
  return rc;
}

/* Decode the packet blob; return the pts values of frames in the
 * decoder's OUTPUT order (the ground truth our DPB bumping must
 * reproduce). */
int
codecoracle_decode_pts (const char *dec_name, const uint8_t * blob,
    uint64_t size, int64_t ** pts_out, uint64_t * n_out)
{
  const AVCodec *codec = avcodec_find_decoder_by_name (dec_name);
  AVCodecContext *ctx = NULL;
  AVFrame *frame = NULL;
  AVPacket *pkt = NULL;
  Buf ptsbuf = { 0 };
  uint32_t n_packets, i;
  const PktHdr *hdrs;
  const uint8_t *payload;
  int rc = -1, ret;

  if (!codec || size < 8 || memcmp (blob, "CORC", 4) != 0)
    return -1;
  memcpy (&n_packets, blob + 4, 4);
  hdrs = (const PktHdr *) (blob + 8);
  payload = blob + 8 + (uint64_t) n_packets * sizeof (PktHdr);

  ctx = avcodec_alloc_context3 (codec);
  frame = av_frame_alloc ();
  pkt = av_packet_alloc ();
  if (!ctx || !frame || !pkt)
    goto done;
  if (avcodec_open2 (ctx, codec, NULL) < 0)
    goto done;

  for (i = 0; i <= n_packets; i++) {
    if (i < n_packets) {
      /* av_new_packet gives the required input-buffer padding */
      if (av_new_packet (pkt, (int) hdrs[i].size) < 0)
        goto done;
      memcpy (pkt->data, payload, hdrs[i].size);
      pkt->pts = hdrs[i].pts;
      pkt->dts = hdrs[i].dts;
      payload += hdrs[i].size;
      ret = avcodec_send_packet (ctx, pkt);
      av_packet_unref (pkt);
    } else {
      ret = avcodec_send_packet (ctx, NULL);
    }
    if (ret < 0 && ret != AVERROR (EAGAIN))
      goto done;
    while ((ret = avcodec_receive_frame (ctx, frame)) == 0) {
      int64_t p = frame->pts;
      if (buf_put (&ptsbuf, &p, 8))
        goto done;
      av_frame_unref (frame);
    }
    if (ret != AVERROR (EAGAIN) && ret != AVERROR_EOF)
      goto done;
  }

  *pts_out = (int64_t *) ptsbuf.data;
  *n_out = ptsbuf.size / 8;
  ptsbuf.data = NULL;
  rc = 0;

done:
  free (ptsbuf.data);
  av_frame_free (&frame);
  av_packet_free (&pkt);
  avcodec_free_context (&ctx);
  return rc;
}

void
codecoracle_free (uint8_t * p)
{
  free (p);
}

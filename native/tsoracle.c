/* tsoracle.c — libavformat-based MPEG-TS oracle for the io/mpegts.py
 * tests.  Two directions:
 *
 *   tsoracle_demux(data, size, &out, &out_size)
 *     Demux an in-memory TS with ffmpeg's mpegts demuxer (AVFMT_FLAG_NOPARSE
 *     so PES payloads come back unsplit).  Result blob layout (LE):
 *       u32 n_streams; per stream: i32 index, i32 kind
 *       then records: i32 stream_index, i64 pts, i64 dts, i32 key,
 *                     u32 size, bytes
 *     pts/dts are in the mpegts 90 kHz time base, AV_NOPTS -> INT64_MIN.
 *
 *   tsoracle_mux(spec, spec_size, &out, &out_size)
 *     Mux packets with ffmpeg's mpegts muxer.  Spec blob (LE):
 *       u32 n_streams; per stream: u32 kind
 *       then records: u32 stream_index, i64 pts, i64 dts, u32 size, bytes
 *
 * kind: 1=mpeg2video 2=mp2 3=h264 4=aac 0=other.
 *
 * Build: gcc -O2 -shared -fPIC -o libtsoracle.so tsoracle.c -lavformat -lavcodec -lavutil
 */

#include <libavformat/avformat.h>
#include <libavutil/mem.h>
#include <stdint.h>
#include <string.h>

typedef struct {
    const uint8_t *data;
    uint64_t size;
    uint64_t pos;
} mem_reader_t;

static int mem_read(void *opaque, uint8_t *buf, int buf_size) {
    mem_reader_t *r = (mem_reader_t *) opaque;
    uint64_t left = r->size - r->pos;
    if (left == 0) return AVERROR_EOF;
    if ((uint64_t) buf_size > left) buf_size = (int) left;
    memcpy(buf, r->data + r->pos, buf_size);
    r->pos += buf_size;
    return buf_size;
}

static int64_t mem_seek(void *opaque, int64_t offset, int whence) {
    mem_reader_t *r = (mem_reader_t *) opaque;
    if (whence == AVSEEK_SIZE) return (int64_t) r->size;
    whence &= ~AVSEEK_FORCE;
    int64_t base = whence == SEEK_SET ? 0
        : whence == SEEK_CUR ? (int64_t) r->pos : (int64_t) r->size;
    int64_t pos = base + offset;
    if (pos < 0 || pos > (int64_t) r->size) return -1;
    r->pos = (uint64_t) pos;
    return pos;
}

typedef struct {
    uint8_t *data;
    uint64_t size;
    uint64_t cap;
} blob_t;

static int blob_put(blob_t *b, const void *p, uint64_t n) {
    if (b->size + n > b->cap) {
        uint64_t cap = b->cap ? b->cap * 2 : 65536;
        while (cap < b->size + n) cap *= 2;
        uint8_t *nd = realloc(b->data, cap);
        if (!nd) return -1;
        b->data = nd;
        b->cap = cap;
    }
    memcpy(b->data + b->size, p, n);
    b->size += n;
    return 0;
}

static int32_t kind_of(enum AVCodecID id) {
    switch (id) {
        case AV_CODEC_ID_MPEG2VIDEO: return 1;
        case AV_CODEC_ID_MP2: return 2;
        case AV_CODEC_ID_MP3: return 2;  /* ts stream type 0x03 probes as mp3 */
        case AV_CODEC_ID_H264: return 3;
        case AV_CODEC_ID_AAC: return 4;
        default: return 0;
    }
}

static enum AVCodecID id_of(uint32_t kind) {
    switch (kind) {
        case 1: return AV_CODEC_ID_MPEG2VIDEO;
        case 2: return AV_CODEC_ID_MP2;
        case 3: return AV_CODEC_ID_H264;
        case 4: return AV_CODEC_ID_AAC;
        default: return AV_CODEC_ID_NONE;
    }
}

void tsoracle_free(uint8_t *p) { free(p); }

static int demux_impl(const uint8_t *data, uint64_t size, uint8_t **out,
                      uint64_t *out_size, const char *format);

int tsoracle_demux(const uint8_t *data, uint64_t size, uint8_t **out,
                   uint64_t *out_size) {
    return demux_impl(data, size, out, out_size, "mpegts");
}

/* Auto-probing variant (MPEG-PS etc.) */
int tsoracle_demux_any(const uint8_t *data, uint64_t size, uint8_t **out,
                       uint64_t *out_size) {
    return demux_impl(data, size, out, out_size, NULL);
}

static int demux_impl(const uint8_t *data, uint64_t size, uint8_t **out,
                      uint64_t *out_size, const char *format) {
    int ret = -1;
    av_log_set_level(AV_LOG_FATAL);
    mem_reader_t reader = {data, size, 0};
    blob_t blob = {NULL, 0, 0};
    AVFormatContext *fmt = NULL;
    AVIOContext *avio = NULL;
    uint8_t *iobuf = av_malloc(32768);
    if (!iobuf) return -1;
    avio = avio_alloc_context(iobuf, 32768, 0, &reader, mem_read, NULL,
                              mem_seek);
    if (!avio) { av_free(iobuf); return -1; }
    fmt = avformat_alloc_context();
    if (!fmt) goto done;
    fmt->pb = avio;
    fmt->flags |= AVFMT_FLAG_NOPARSE;
    const AVInputFormat *infmt =
        format ? av_find_input_format(format) : NULL;
    if (avformat_open_input(&fmt, "<mem>", infmt, NULL) < 0) goto done;
    /* best-effort: with NOPARSE and opaque payloads this can fail while
     * the PMT-driven stream table is still perfectly valid */
    avformat_find_stream_info(fmt, NULL);

    uint32_t n = fmt->nb_streams;
    blob_put(&blob, &n, 4);
    for (uint32_t i = 0; i < n; ++i) {
        int32_t idx = (int32_t) i;
        int32_t kind = kind_of(fmt->streams[i]->codecpar->codec_id);
        blob_put(&blob, &idx, 4);
        blob_put(&blob, &kind, 4);
    }

    AVPacket *pkt = av_packet_alloc();
    while (av_read_frame(fmt, pkt) >= 0) {
        int32_t idx = pkt->stream_index;
        int64_t pts = pkt->pts == AV_NOPTS_VALUE ? INT64_MIN : pkt->pts;
        int64_t dts = pkt->dts == AV_NOPTS_VALUE ? INT64_MIN : pkt->dts;
        int32_t key = (pkt->flags & AV_PKT_FLAG_KEY) ? 1 : 0;
        uint32_t sz = pkt->size;
        blob_put(&blob, &idx, 4);
        blob_put(&blob, &pts, 8);
        blob_put(&blob, &dts, 8);
        blob_put(&blob, &key, 4);
        blob_put(&blob, &sz, 4);
        blob_put(&blob, pkt->data, sz);
        av_packet_unref(pkt);
    }
    av_packet_free(&pkt);
    *out = blob.data;
    *out_size = blob.size;
    blob.data = NULL;
    ret = 0;
done:
    free(blob.data);
    if (fmt) avformat_close_input(&fmt);
    if (avio) {
        av_free(avio->buffer);
        avio_context_free(&avio);
    }
    return ret;
}

static int mux_impl(const uint8_t *spec, uint64_t spec_size,
                    uint8_t **out, uint64_t *out_size,
                    const char *format) {
    int ret = -1;
    uint64_t pos = 0;
    AVFormatContext *fmt = NULL;
    av_log_set_level(AV_LOG_FATAL);
    if (spec_size < 4) return -1;
    uint32_t n_streams;
    memcpy(&n_streams, spec, 4);
    pos = 4;

    if (avformat_alloc_output_context2(&fmt, NULL, format, NULL) < 0)
        return -1;
    if (avio_open_dyn_buf(&fmt->pb) < 0) goto done;

    for (uint32_t i = 0; i < n_streams; ++i) {
        uint32_t kind;
        if (pos + 4 > spec_size) goto done;
        memcpy(&kind, spec + pos, 4);
        pos += 4;
        AVStream *st = avformat_new_stream(fmt, NULL);
        if (!st) goto done;
        enum AVCodecID id = id_of(kind);
        st->codecpar->codec_id = id;
        st->codecpar->codec_type =
            (kind == 1 || kind == 3) ? AVMEDIA_TYPE_VIDEO
                                     : AVMEDIA_TYPE_AUDIO;
        if (st->codecpar->codec_type == AVMEDIA_TYPE_VIDEO) {
            st->codecpar->width = 64;
            st->codecpar->height = 48;
        } else {
            st->codecpar->sample_rate = 48000;
        }
        st->time_base = (AVRational) {1, 90000};
    }
    if (avformat_write_header(fmt, NULL) < 0) goto done;

    AVPacket *pkt = av_packet_alloc();
    while (pos + 24 <= spec_size) {
        uint32_t idx, sz;
        int64_t pts, dts;
        memcpy(&idx, spec + pos, 4);
        memcpy(&pts, spec + pos + 4, 8);
        memcpy(&dts, spec + pos + 12, 8);
        memcpy(&sz, spec + pos + 20, 4);
        pos += 24;
        if (pos + sz > spec_size) break;
        av_new_packet(pkt, sz);
        memcpy(pkt->data, spec + pos, sz);
        pos += sz;
        pkt->stream_index = idx;
        pkt->pts = pts == INT64_MIN ? AV_NOPTS_VALUE : pts;
        pkt->dts = dts == INT64_MIN ? AV_NOPTS_VALUE : dts;
        pkt->flags |= AV_PKT_FLAG_KEY;
        if (av_interleaved_write_frame(fmt, pkt) < 0) {
            av_packet_free(&pkt);
            goto done;
        }
    }
    av_packet_free(&pkt);
    if (av_write_trailer(fmt) < 0) goto done;

    {
        uint8_t *dyn = NULL;
        int dyn_size = avio_close_dyn_buf(fmt->pb, &dyn);
        fmt->pb = NULL;
        *out = malloc(dyn_size);
        if (*out) {
            memcpy(*out, dyn, dyn_size);
            *out_size = dyn_size;
            ret = 0;
        }
        av_free(dyn);
    }
done:
    if (fmt) {
        if (fmt->pb) {
            uint8_t *dyn = NULL;
            avio_close_dyn_buf(fmt->pb, &dyn);
            av_free(dyn);
        }
        avformat_free_context(fmt);
    }
    return ret;
}

int tsoracle_mux(const uint8_t *spec, uint64_t spec_size, uint8_t **out,
                 uint64_t *out_size) {
    return mux_impl(spec, spec_size, out, out_size, "mpegts");
}

/* MPEG-2 program stream ("vob" muxer, what mpegpsmux produces) */
int tsoracle_mux_ps(const uint8_t *spec, uint64_t spec_size,
                    uint8_t **out, uint64_t *out_size) {
    return mux_impl(spec, spec_size, out, out_size, "vob");
}

/* Build a real MXF (or other container) sample in memory by encoding
 * actual mpeg2video frames + pcm_s16le audio with libavcodec — some
 * muxers (mxf) sniff essence bitstreams, so opaque payloads don't
 * work.  Used as the demux-side oracle input for io/mxf.py. */
#include <libavcodec/avcodec.h>
#include <libavutil/imgutils.h>
#include <libavutil/channel_layout.h>

int tsoracle_make_sample(const char *format, int n_frames, uint8_t **out,
                         uint64_t *out_size) {
    int ret = -1;
    av_log_set_level(AV_LOG_FATAL);
    AVFormatContext *fmt = NULL;
    AVCodecContext *venc = NULL;
    AVFrame *frame = NULL;
    AVPacket *pkt = NULL;

    const AVCodec *vcodec = avcodec_find_encoder(AV_CODEC_ID_MPEG2VIDEO);
    if (!vcodec) return -2;
    if (avformat_alloc_output_context2(&fmt, NULL, format, NULL) < 0)
        return -1;
    if (avio_open_dyn_buf(&fmt->pb) < 0) goto done;

    venc = avcodec_alloc_context3(vcodec);
    venc->width = 64;
    venc->height = 48;
    venc->time_base = (AVRational) {1, 25};
    venc->framerate = (AVRational) {25, 1};
    venc->pix_fmt = AV_PIX_FMT_YUV420P;
    venc->gop_size = 5;
    venc->max_b_frames = 0;
    venc->bit_rate = 400000;
    if (avcodec_open2(venc, vcodec, NULL) < 0) goto done;

    AVStream *v = avformat_new_stream(fmt, NULL);
    avcodec_parameters_from_context(v->codecpar, venc);
    v->time_base = venc->time_base;
    v->avg_frame_rate = venc->framerate;

    AVStream *a = avformat_new_stream(fmt, NULL);
    a->codecpar->codec_id = AV_CODEC_ID_PCM_S16LE;
    a->codecpar->codec_type = AVMEDIA_TYPE_AUDIO;
    a->codecpar->sample_rate = 48000;
    a->codecpar->ch_layout = (AVChannelLayout) AV_CHANNEL_LAYOUT_STEREO;
    a->codecpar->format = AV_SAMPLE_FMT_S16;
    a->codecpar->bits_per_coded_sample = 16;
    a->time_base = (AVRational) {1, 48000};

    if (avformat_write_header(fmt, NULL) < 0) goto done;

    frame = av_frame_alloc();
    frame->format = AV_PIX_FMT_YUV420P;
    frame->width = 64;
    frame->height = 48;
    av_frame_get_buffer(frame, 0);
    pkt = av_packet_alloc();

    int samples_per_frame = 48000 / 25;
    for (int i = 0; i <= n_frames; ++i) {
        int rc;
        if (i < n_frames) {
            av_frame_make_writable(frame);
            for (int y = 0; y < 48; ++y)
                memset(frame->data[0] + y * frame->linesize[0],
                       16 + 3 * i + y, 64);
            for (int y = 0; y < 24; ++y) {
                memset(frame->data[1] + y * frame->linesize[1],
                       128 + i, 32);
                memset(frame->data[2] + y * frame->linesize[2],
                       128 - i, 32);
            }
            frame->pts = i;
            rc = avcodec_send_frame(venc, frame);
        } else {
            rc = avcodec_send_frame(venc, NULL);  /* flush */
        }
        if (rc < 0) goto done;
        while (avcodec_receive_packet(venc, pkt) == 0) {
            pkt->stream_index = 0;
            av_packet_rescale_ts(pkt, venc->time_base, v->time_base);
            if (av_interleaved_write_frame(fmt, pkt) < 0) goto done;
        }
        if (i < n_frames) {
            /* one audio packet per video frame */
            av_new_packet(pkt, samples_per_frame * 2 * 2);
            for (int s = 0; s < samples_per_frame * 2; ++s) {
                int16_t val = (int16_t) ((i * 997 + s * 31) & 0x7FFF);
                memcpy(pkt->data + 2 * s, &val, 2);
            }
            pkt->stream_index = 1;
            pkt->pts = pkt->dts = (int64_t) i * samples_per_frame;
            pkt->duration = samples_per_frame;
            if (av_interleaved_write_frame(fmt, pkt) < 0) goto done;
        }
    }
    if (av_write_trailer(fmt) < 0) goto done;
    {
        uint8_t *dyn = NULL;
        int n = avio_close_dyn_buf(fmt->pb, &dyn);
        fmt->pb = NULL;
        *out = malloc(n);
        if (*out) {
            memcpy(*out, dyn, n);
            *out_size = n;
            ret = 0;
        }
        av_free(dyn);
    }
done:
    if (pkt) av_packet_free(&pkt);
    if (frame) av_frame_free(&frame);
    if (venc) avcodec_free_context(&venc);
    if (fmt) {
        if (fmt->pb) {
            uint8_t *dyn = NULL;
            avio_close_dyn_buf(fmt->pb, &dyn);
            av_free(dyn);
        }
        avformat_free_context(fmt);
    }
    return ret;
}

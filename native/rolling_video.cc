// rolling_video — native video decode/encode for the rollingdepth_tpu host
// pipeline.
//
// Behavioral reference: the reference decodes with PyAV (ffmpeg) using
// multithreaded decoding, per-frame aspect-preserving resize to a max edge,
// and [-1, 1] float normalization (/root/reference/rollingdepth/
// video_io.py:71-137), and encodes with a libx264->h264->mpeg4->mjpeg codec
// fallback chain at yuv420p (:140-208).  This implements the same behavior
// directly on libavformat/libavcodec/libswscale, exposed through a C ABI for
// ctypes (no pybind11 in this environment).
//
// The decoder releases the GIL-equivalent (it runs on a plain pthread via
// Python threading) so host decode overlaps device compute.

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libavutil/opt.h>
#include <libswscale/swscale.h>
}

namespace {

struct DecodedVideo {
  std::vector<uint8_t> frames;  // [n, h, w, 3] RGB
  int n = 0, h = 0, w = 0;
  int orig_h = 0, orig_w = 0;
  double fps = 0.0;
  std::string error;
};

void compute_resized(int in_w, int in_h, int max_edge, int* out_w, int* out_h) {
  if (max_edge <= 0) {
    *out_w = in_w;
    *out_h = in_h;
    return;
  }
  double scale = std::min((double)max_edge / in_w, (double)max_edge / in_h);
  *out_w = (int)(in_w * scale);
  *out_h = (int)(in_h * scale);
}

DecodedVideo* decode_impl(const char* path, int start_frame, int frame_count,
                          int max_edge) {
  auto* out = new DecodedVideo();
  AVFormatContext* fmt = nullptr;
  if (avformat_open_input(&fmt, path, nullptr, nullptr) < 0) {
    out->error = "cannot open input";
    return out;
  }
  if (avformat_find_stream_info(fmt, nullptr) < 0) {
    out->error = "no stream info";
    avformat_close_input(&fmt);
    return out;
  }
  int vstream = av_find_best_stream(fmt, AVMEDIA_TYPE_VIDEO, -1, -1, nullptr, 0);
  if (vstream < 0) {
    out->error = "no video stream";
    avformat_close_input(&fmt);
    return out;
  }
  AVStream* stream = fmt->streams[vstream];
  const AVCodec* codec = avcodec_find_decoder(stream->codecpar->codec_id);
  AVCodecContext* ctx = avcodec_alloc_context3(codec);
  avcodec_parameters_to_context(ctx, stream->codecpar);
  // multithreaded decode (PyAV thread_type="AUTO", video_io.py:89)
  ctx->thread_count = 0;
  ctx->thread_type = FF_THREAD_FRAME | FF_THREAD_SLICE;
  if (avcodec_open2(ctx, codec, nullptr) < 0) {
    out->error = "cannot open codec";
    avcodec_free_context(&ctx);
    avformat_close_input(&fmt);
    return out;
  }
  out->fps = av_q2d(stream->avg_frame_rate);

  AVPacket* pkt = av_packet_alloc();
  AVFrame* frame = av_frame_alloc();
  SwsContext* sws = nullptr;
  int out_w = 0, out_h = 0;
  int64_t index = 0;
  const int64_t end_before =
      frame_count > 0 ? (int64_t)start_frame + frame_count : INT64_MAX;

  auto handle_frame = [&]() {
    if (index < start_frame || index >= end_before) {
      index++;
      return;
    }
    if (!sws) {
      out->orig_w = frame->width;
      out->orig_h = frame->height;
      compute_resized(frame->width, frame->height, max_edge, &out_w, &out_h);
      out->w = out_w;
      out->h = out_h;
      // bilinear for parity with the reference's resize intent
      sws = sws_getContext(frame->width, frame->height,
                           (AVPixelFormat)frame->format, out_w, out_h,
                           AV_PIX_FMT_RGB24, SWS_BILINEAR | SWS_ACCURATE_RND,
                           nullptr, nullptr, nullptr);
    }
    size_t base = out->frames.size();
    out->frames.resize(base + (size_t)out_w * out_h * 3);
    uint8_t* dst[1] = {out->frames.data() + base};
    int dst_stride[1] = {out_w * 3};
    sws_scale(sws, frame->data, frame->linesize, 0, frame->height, dst,
              dst_stride);
    out->n++;
    index++;
  };

  while (av_read_frame(fmt, pkt) >= 0 && index < end_before) {
    if (pkt->stream_index == vstream) {
      // canonical send/receive pattern: on EAGAIN, drain frames and resend
      // (frame-threaded decoders hold several frames in flight)
      int ret = avcodec_send_packet(ctx, pkt);
      while (ret == AVERROR(EAGAIN)) {
        while (avcodec_receive_frame(ctx, frame) >= 0) handle_frame();
        ret = avcodec_send_packet(ctx, pkt);
      }
      while (avcodec_receive_frame(ctx, frame) >= 0) handle_frame();
    }
    av_packet_unref(pkt);
  }
  // flush
  avcodec_send_packet(ctx, nullptr);
  while (avcodec_receive_frame(ctx, frame) >= 0 && index < end_before)
    handle_frame();

  if (sws) sws_freeContext(sws);
  av_frame_free(&frame);
  av_packet_free(&pkt);
  avcodec_free_context(&ctx);
  avformat_close_input(&fmt);
  if (out->n == 0 && out->error.empty()) out->error = "no frame decoded";
  return out;
}

struct Encoder {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* ctx = nullptr;
  AVStream* stream = nullptr;
  SwsContext* sws = nullptr;
  AVFrame* yuv = nullptr;
  int w = 0, h = 0;
  int64_t pts = 0;
  std::string error;
};

}  // namespace

extern "C" {

// ---- decode API -----------------------------------------------------------

void* rv_decode(const char* path, int start_frame, int frame_count,
                int max_edge) {
  return decode_impl(path, start_frame, frame_count, max_edge);
}

int rv_num_frames(void* h) { return ((DecodedVideo*)h)->n; }
int rv_height(void* h) { return ((DecodedVideo*)h)->h; }
int rv_width(void* h) { return ((DecodedVideo*)h)->w; }
int rv_orig_height(void* h) { return ((DecodedVideo*)h)->orig_h; }
int rv_orig_width(void* h) { return ((DecodedVideo*)h)->orig_w; }
double rv_fps(void* h) { return ((DecodedVideo*)h)->fps; }
const char* rv_error(void* h) { return ((DecodedVideo*)h)->error.c_str(); }

void rv_copy_frames(void* h, float* dst) {
  // [n, h, w, 3] uint8 -> [n, 3, h, w] float in [-1, 1]
  auto* v = (DecodedVideo*)h;
  const size_t plane = (size_t)v->h * v->w;
  for (int f = 0; f < v->n; ++f) {
    const uint8_t* src = v->frames.data() + (size_t)f * plane * 3;
    float* d = dst + (size_t)f * plane * 3;
    for (size_t p = 0; p < plane; ++p) {
      d[0 * plane + p] = src[p * 3 + 0] / 255.0f * 2.0f - 1.0f;
      d[1 * plane + p] = src[p * 3 + 1] / 255.0f * 2.0f - 1.0f;
      d[2 * plane + p] = src[p * 3 + 2] / 255.0f * 2.0f - 1.0f;
    }
  }
}

void rv_copy_frames_u8(void* h, uint8_t* dst) {
  // raw [n, h, w, 3] RGB
  auto* v = (DecodedVideo*)h;
  std::memcpy(dst, v->frames.data(), v->frames.size());
}

void rv_free(void* h) { delete (DecodedVideo*)h; }

// ---- encode API -----------------------------------------------------------

void* rv_encoder_open(const char* path, int width, int height, double fps,
                      const char* codec_name) {
  auto* e = new Encoder();
  e->w = width;
  e->h = height;
  if (fps <= 0 || width <= 0 || height <= 0) {
    // fps<=0 would build an AVRational time_base with denominator 0
    e->error = "invalid encoder parameters (fps/width/height must be > 0)";
    return e;
  }
  avformat_alloc_output_context2(&e->fmt, nullptr, nullptr, path);
  if (!e->fmt) {
    e->error = "cannot allocate output context";
    return e;
  }
  // codec fallback chain (video_io.py:157-176)
  const char* candidates[] = {"libx264", "h264", "mpeg4", "mjpeg"};
  const AVCodec* codec = nullptr;
  if (codec_name && codec_name[0]) {
    codec = avcodec_find_encoder_by_name(codec_name);
  } else {
    for (const char* c : candidates) {
      codec = avcodec_find_encoder_by_name(c);
      if (codec) break;
    }
  }
  if (!codec) {
    e->error = "no working codec found";
    return e;
  }
  e->stream = avformat_new_stream(e->fmt, codec);
  e->ctx = avcodec_alloc_context3(codec);
  e->ctx->width = width;
  e->ctx->height = height;
  e->ctx->time_base = AVRational{1000, (int)(fps * 1000)};
  e->ctx->framerate = AVRational{(int)(fps * 1000), 1000};
  e->ctx->pix_fmt = AV_PIX_FMT_YUV420P;
  e->ctx->gop_size = 12;
  if (std::string(codec->name) == "mjpeg")
    e->ctx->pix_fmt = AV_PIX_FMT_YUVJ420P;
  if (std::string(codec->name) == "libx264" || std::string(codec->name) == "h264") {
    av_opt_set(e->ctx->priv_data, "crf", "23", 0);
    av_opt_set(e->ctx->priv_data, "preset", "medium", 0);
  }
  if (e->fmt->oformat->flags & AVFMT_GLOBALHEADER)
    e->ctx->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
  if (avcodec_open2(e->ctx, codec, nullptr) < 0) {
    e->error = "cannot open encoder";
    return e;
  }
  avcodec_parameters_from_context(e->stream->codecpar, e->ctx);
  e->stream->time_base = e->ctx->time_base;
  if (!(e->fmt->oformat->flags & AVFMT_NOFILE)) {
    if (avio_open(&e->fmt->pb, path, AVIO_FLAG_WRITE) < 0) {
      e->error = "cannot open output file";
      return e;
    }
  }
  if (avformat_write_header(e->fmt, nullptr) < 0) {
    e->error = "cannot write header";
    return e;
  }
  e->sws = sws_getContext(width, height, AV_PIX_FMT_RGB24, width, height,
                          e->ctx->pix_fmt, SWS_BILINEAR, nullptr, nullptr,
                          nullptr);
  e->yuv = av_frame_alloc();
  e->yuv->format = e->ctx->pix_fmt;
  e->yuv->width = width;
  e->yuv->height = height;
  av_frame_get_buffer(e->yuv, 0);
  return e;
}

const char* rv_encoder_error(void* h) { return ((Encoder*)h)->error.c_str(); }

int rv_encoder_write(void* h, const uint8_t* rgb) {
  auto* e = (Encoder*)h;
  if (!e->error.empty()) return -1;
  const uint8_t* src[1] = {rgb};
  int src_stride[1] = {e->w * 3};
  av_frame_make_writable(e->yuv);
  sws_scale(e->sws, src, src_stride, 0, e->h, e->yuv->data, e->yuv->linesize);
  e->yuv->pts = e->pts++;
  if (avcodec_send_frame(e->ctx, e->yuv) < 0) return -1;
  AVPacket* pkt = av_packet_alloc();
  while (avcodec_receive_packet(e->ctx, pkt) >= 0) {
    av_packet_rescale_ts(pkt, e->ctx->time_base, e->stream->time_base);
    pkt->stream_index = e->stream->index;
    // explicit per-sample duration: without it the mp4 muxer elides the
    // final sample from the packet index
    pkt->duration = av_rescale_q(1, e->ctx->time_base, e->stream->time_base);
    av_interleaved_write_frame(e->fmt, pkt);
    av_packet_unref(pkt);
  }
  av_packet_free(&pkt);
  return 0;
}

int rv_encoder_close(void* h) {
  auto* e = (Encoder*)h;
  if (e->ctx && e->error.empty()) {
    avcodec_send_frame(e->ctx, nullptr);
    AVPacket* pkt = av_packet_alloc();
    while (avcodec_receive_packet(e->ctx, pkt) >= 0) {
      av_packet_rescale_ts(pkt, e->ctx->time_base, e->stream->time_base);
      pkt->stream_index = e->stream->index;
      pkt->duration = av_rescale_q(1, e->ctx->time_base, e->stream->time_base);
      av_interleaved_write_frame(e->fmt, pkt);
      av_packet_unref(pkt);
    }
    av_packet_free(&pkt);
    av_write_trailer(e->fmt);
  }
  if (e->sws) sws_freeContext(e->sws);
  if (e->yuv) av_frame_free(&e->yuv);
  if (e->ctx) avcodec_free_context(&e->ctx);
  if (e->fmt) {
    if (!(e->fmt->oformat->flags & AVFMT_NOFILE) && e->fmt->pb)
      avio_closep(&e->fmt->pb);
    avformat_free_context(e->fmt);
  }
  delete e;
  return 0;
}

double rv_probe_fps(const char* path) {
  AVFormatContext* fmt = nullptr;
  if (avformat_open_input(&fmt, path, nullptr, nullptr) < 0) return 0.0;
  if (avformat_find_stream_info(fmt, nullptr) < 0) {
    avformat_close_input(&fmt);
    return 0.0;
  }
  int vs = av_find_best_stream(fmt, AVMEDIA_TYPE_VIDEO, -1, -1, nullptr, 0);
  double fps = vs >= 0 ? av_q2d(fmt->streams[vs]->avg_frame_rate) : 0.0;
  avformat_close_input(&fmt);
  return fps;
}

}  // extern "C"

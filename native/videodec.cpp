// videodec — minimal frame-accurate video decoder on FFmpeg's libav*.
//
// The TPU-native replacement for the reference's decord dependency
// (reference: dataset/video_utils/utils.py:97-117 read_frames_decord):
// open a container, decode the video stream, and return the requested
// frame indices as packed RGB24, optionally rescaled by swscale.
//
// Exposed as a tiny C ABI consumed from Python via ctypes
// (youku_mplug_tpu/data/native_decode.py).  One handle per file; handles
// are NOT thread-safe, but distinct handles decode concurrently — the
// loader runs one handle per worker thread and the heavy lifting
// (avcodec_receive_frame, sws_scale) releases no GIL to begin with.
//
// Build: see native/build.sh (g++ -O2 -shared -fPIC ... -lavformat
// -lavcodec -lavutil -lswscale).

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libswscale/swscale.h>
}

#include <algorithm>
#include <cmath>
#include <cstring>
#include <vector>

namespace {

struct Handle {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* codec = nullptr;
  SwsContext* sws = nullptr;
  int stream_index = -1;
  int64_t num_frames = 0;   // best-effort container frame count
  double fps = 0.0;
  int width = 0;
  int height = 0;
  int sws_w = 0, sws_h = 0;
  AVPacket* pkt = nullptr;
  AVFrame* frame = nullptr;
  int64_t next_frame_idx = 0;  // index of the next frame decode will yield
};

void destroy(Handle* h) {
  if (!h) return;
  if (h->sws) sws_freeContext(h->sws);
  if (h->frame) av_frame_free(&h->frame);
  if (h->pkt) av_packet_free(&h->pkt);
  if (h->codec) avcodec_free_context(&h->codec);
  if (h->fmt) avformat_close_input(&h->fmt);
  delete h;
}

// Decode forward until the next frame is produced; returns 0 on success,
// AVERROR_EOF at end, <0 on error.
int next_frame(Handle* h) {
  while (true) {
    int ret = avcodec_receive_frame(h->codec, h->frame);
    if (ret == 0) return 0;
    if (ret != AVERROR(EAGAIN) && ret != AVERROR_EOF) return ret;
    if (ret == AVERROR_EOF) return AVERROR_EOF;
    // need more input
    while (true) {
      ret = av_read_frame(h->fmt, h->pkt);
      if (ret == AVERROR_EOF) {
        // flush
        avcodec_send_packet(h->codec, nullptr);
        break;
      }
      if (ret < 0) return ret;
      if (h->pkt->stream_index == h->stream_index) {
        ret = avcodec_send_packet(h->codec, h->pkt);
        av_packet_unref(h->pkt);
        if (ret < 0 && ret != AVERROR(EAGAIN)) return ret;
        break;
      }
      av_packet_unref(h->pkt);
    }
  }
}

}  // namespace

extern "C" {

void* vd_open(const char* path) {
  av_log_set_level(AV_LOG_ERROR);
  Handle* h = new Handle();
  if (avformat_open_input(&h->fmt, path, nullptr, nullptr) < 0) {
    destroy(h);
    return nullptr;
  }
  if (avformat_find_stream_info(h->fmt, nullptr) < 0) {
    destroy(h);
    return nullptr;
  }
  h->stream_index = av_find_best_stream(h->fmt, AVMEDIA_TYPE_VIDEO, -1, -1,
                                        nullptr, 0);
  if (h->stream_index < 0) {
    destroy(h);
    return nullptr;
  }
  AVStream* st = h->fmt->streams[h->stream_index];
  const AVCodec* dec = avcodec_find_decoder(st->codecpar->codec_id);
  if (!dec) {
    destroy(h);
    return nullptr;
  }
  h->codec = avcodec_alloc_context3(dec);
  avcodec_parameters_to_context(h->codec, st->codecpar);
  h->codec->thread_count = 1;  // loader parallelism is across files
  if (avcodec_open2(h->codec, dec, nullptr) < 0) {
    destroy(h);
    return nullptr;
  }
  h->width = h->codec->width;
  h->height = h->codec->height;
  AVRational r = st->avg_frame_rate.num ? st->avg_frame_rate
                                        : st->r_frame_rate;
  h->fps = r.den ? av_q2d(r) : 0.0;
  h->num_frames = st->nb_frames;
  if (h->num_frames <= 0 && h->fps > 0 && st->duration > 0) {
    h->num_frames = (int64_t)(av_q2d(st->time_base) * st->duration * h->fps);
  }
  if (h->num_frames <= 0 && h->fps > 0 && h->fmt->duration > 0) {
    h->num_frames = (int64_t)(h->fmt->duration / (double)AV_TIME_BASE
                              * h->fps);
  }
  h->pkt = av_packet_alloc();
  h->frame = av_frame_alloc();
  return h;
}

long vd_num_frames(void* handle) {
  return (long)((Handle*)handle)->num_frames;
}

double vd_fps(void* handle) { return ((Handle*)handle)->fps; }

int vd_width(void* handle) { return ((Handle*)handle)->width; }

int vd_height(void* handle) { return ((Handle*)handle)->height; }

// Read |n| frames by (sorted or unsorted) indices into |out|
// (n * out_h * out_w * 3, RGB24, row-major).  Duplicated indices are
// served from the same decode.  Returns the number of frames written.
int vd_read_frames(void* handle, const long* indices, int n, int out_w,
                   int out_h, unsigned char* out) {
  Handle* h = (Handle*)handle;
  if (n <= 0) return 0;

  // order of decode: ascending unique indices
  std::vector<std::pair<long, int>> order(n);
  for (int i = 0; i < n; ++i) order[i] = {indices[i], i};
  std::sort(order.begin(), order.end());

  if (out_w <= 0) out_w = h->width;
  if (out_h <= 0) out_h = h->height;
  if (!h->sws || h->sws_w != out_w || h->sws_h != out_h) {
    if (h->sws) sws_freeContext(h->sws);
    // FAST_BILINEAR when actually rescaling (decode_short_side): the
    // output feeds training augmentation that re-resamples anyway
    // (RandomResizedCrop), so bicubic's quality edge is thrown away —
    // fast bilinear halves the scaler cost at production resolutions.
    // Same-dims calls take swscale's unscaled convert path regardless
    // of the flag.
    const int sws_flags = (out_w == h->width && out_h == h->height)
                              ? SWS_BICUBIC
                              : SWS_FAST_BILINEAR;
    h->sws = sws_getContext(h->width, h->height, h->codec->pix_fmt, out_w,
                            out_h, AV_PIX_FMT_RGB24, sws_flags, nullptr,
                            nullptr, nullptr);
    h->sws_w = out_w;
    h->sws_h = out_h;
    if (!h->sws) return -1;
  }

  const size_t frame_bytes = (size_t)out_w * out_h * 3;
  uint8_t* dst_data[4] = {nullptr, nullptr, nullptr, nullptr};
  int dst_linesize[4] = {out_w * 3, 0, 0, 0};

  // --- keyframe-aware seeking (the decord behavior) ------------------
  // Sparse sampling (8 frames from a multi-hundred-frame clip) must not
  // decode every intermediate frame: seek to the keyframe at/before the
  // target and decode forward from there.  Frame indices are recovered
  // from best_effort_timestamp; when the stream has no usable pts we
  // fall back to sequential decode.
  AVStream* st = h->fmt->streams[h->stream_index];
  const double tb = av_q2d(st->time_base);
  const int64_t start_ts =
      st->start_time == AV_NOPTS_VALUE ? 0 : st->start_time;
  bool can_index = h->fps > 0 && tb > 0;
  const long kSeekGap = 16;  // decode-forward cheaper below this gap

  auto frame_index = [&](int64_t fallback) -> int64_t {
    int64_t ts = h->frame->best_effort_timestamp;
    if (!can_index || ts == AV_NOPTS_VALUE) return fallback;
    return (int64_t)llround((ts - start_ts) * tb * h->fps);
  };
  auto seek_to = [&](long target) -> bool {
    if (!can_index) return false;
    int64_t ts = start_ts + (int64_t)(target / h->fps / tb);
    if (av_seek_frame(h->fmt, h->stream_index, ts,
                      AVSEEK_FLAG_BACKWARD) < 0)
      return false;
    avcodec_flush_buffers(h->codec);
    h->next_frame_idx = -1;  // unknown until the first frame decodes
    return true;
  };

  // rewind if we already passed the first wanted index
  if (order[0].first < h->next_frame_idx) {
    if (!seek_to(order[0].first)) {
      av_seek_frame(h->fmt, h->stream_index, 0,
                    AVSEEK_FLAG_BACKWARD | AVSEEK_FLAG_FRAME);
      avcodec_flush_buffers(h->codec);
      h->next_frame_idx = 0;
    }
  } else if (order[0].first >= h->next_frame_idx + kSeekGap) {
    seek_to(order[0].first);
  }

  int written = 0;
  size_t oi = 0;
  unsigned char* last_frame_at = nullptr;
  bool sought_back = false;  // guards against seek landing past target
  // GOP catch-up decode-skip: while the next wanted index is further
  // ahead than any codec reorder window, non-reference frames (B
  // frames on real corpora) need not be decoded at all — they can
  // never influence a later frame's pixels, so every DELIVERED frame
  // stays bit-identical to a full decode.  Within kReorder of the
  // target, full decode resumes so a wanted non-ref frame is never
  // discarded.  (The reference's decord decodes every catch-up frame:
  // dataset/video_utils/utils.py:97-117.)
  const long kReorder = 16;
  while (oi < order.size()) {
    // forward-seek across large gaps between consecutive wanted indices
    if (!sought_back && h->next_frame_idx >= 0 &&
        order[oi].first >= h->next_frame_idx + kSeekGap) {
      seek_to(order[oi].first);
    }
    if (can_index && h->next_frame_idx >= 0 &&
        order[oi].first - h->next_frame_idx > kReorder) {
      h->codec->skip_frame = AVDISCARD_NONREF;
    } else {
      h->codec->skip_frame = AVDISCARD_DEFAULT;
    }
    int ret = next_frame(h);
    if (ret != 0) break;  // EOF/error: pad below
    if (h->next_frame_idx < 0 &&
        h->frame->best_effort_timestamp == AV_NOPTS_VALUE) {
      // first frame after a seek has no usable timestamp: we cannot know
      // where the seek landed, so relabeling from 0 here would silently
      // return wrong frames.  Rewind to the true frame 0 and decode
      // sequentially for the rest of this call.
      av_frame_unref(h->frame);
      can_index = false;
      av_seek_frame(h->fmt, h->stream_index, 0,
                    AVSEEK_FLAG_BACKWARD | AVSEEK_FLAG_FRAME);
      avcodec_flush_buffers(h->codec);
      h->next_frame_idx = 0;
      continue;
    }
    int64_t cur = frame_index(h->next_frame_idx < 0 ? 0
                                                    : h->next_frame_idx);
    if (cur < 0) cur = 0;
    h->next_frame_idx = cur + 1;
    if (cur > order[oi].first && !sought_back && can_index) {
      // a seek overshot the target (sparse keyframes / imprecise pts):
      // retry once from the start of the file, then decode sequentially
      av_frame_unref(h->frame);
      sought_back = true;
      if (seek_to(0)) continue;
    }
    bool wanted = false;
    while (oi < order.size() && order[oi].first == cur) {
      unsigned char* dst = out + frame_bytes * order[oi].second;
      if (!wanted) {
        dst_data[0] = dst;
        sws_scale(h->sws, h->frame->data, h->frame->linesize, 0, h->height,
                  dst_data, dst_linesize);
        wanted = true;
        last_frame_at = dst;
      } else {
        std::memcpy(dst, last_frame_at, frame_bytes);
      }
      ++written;
      ++oi;
    }
    if (wanted) last_frame_at = out + frame_bytes * order[oi - 1].second;
    av_frame_unref(h->frame);
  }

  // pad any unserved (out-of-range) indices with the last decoded frame
  while (oi < order.size() && last_frame_at) {
    std::memcpy(out + frame_bytes * order[oi].second, last_frame_at,
                frame_bytes);
    ++written;
    ++oi;
  }
  return written;
}

void vd_close(void* handle) { destroy((Handle*)handle); }

}  // extern "C"

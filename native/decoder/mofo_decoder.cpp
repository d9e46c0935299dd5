// mofo_decoder: FFmpeg-based clip decoder for the mofo_tpu input pipeline.
//
// TPU-native replacement for the reference's decord dependency
// (kinetics.py:485-490: VideoReader(...).get_batch(ids).asnumpy()).
// C ABI for ctypes binding; one handle per open video.
//
// Capabilities:
//   - random access by frame index (seek to keyframe, decode forward)
//   - batched frame fetch into one contiguous RGB24 buffer
//   - optional scaling at decode time (swscale), like decord's
//     width/height args (kinetics.py:238-240) — lets the host hand the
//     device a canonical size and keeps augmentation on-TPU
//
// Build: see Makefile (links libavformat/libavcodec/libavutil/libswscale).

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libswscale/swscale.h>
}

#include <algorithm>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct FrameIndexEntry {
  int64_t pts;
  bool keyframe;
};

struct MofoVideo {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* codec = nullptr;
  SwsContext* sws = nullptr;
  int stream_idx = -1;
  int src_w = 0, src_h = 0;
  int out_w = 0, out_h = 0;
  double fps = 0.0;
  std::vector<FrameIndexEntry> index;  // pts per frame, ascending
  int64_t cursor = -1;  // index of last decoded frame, -1 = fresh
  AVFrame* frame = nullptr;
  AVFrame* rgb = nullptr;
  std::vector<uint8_t> rgb_buf;
  std::string error;
};

// Demux the whole file once to build a frame index (pts + keyframe flag).
// This is what decord does to give exact random access even for streams
// with no nb_frames metadata (webm).
bool build_index(MofoVideo* v) {
  AVPacket* pkt = av_packet_alloc();
  while (av_read_frame(v->fmt, pkt) >= 0) {
    if (pkt->stream_index == v->stream_idx) {
      int64_t pts = pkt->pts != AV_NOPTS_VALUE ? pkt->pts : pkt->dts;
      v->index.push_back({pts, (pkt->flags & AV_PKT_FLAG_KEY) != 0});
    }
    av_packet_unref(pkt);
  }
  av_packet_free(&pkt);
  std::sort(v->index.begin(), v->index.end(),
            [](const FrameIndexEntry& a, const FrameIndexEntry& b) {
              return a.pts < b.pts;
            });
  // rewind
  av_seek_frame(v->fmt, v->stream_idx, 0,
                AVSEEK_FLAG_BACKWARD);
  avcodec_flush_buffers(v->codec);
  v->cursor = -1;
  return !v->index.empty();
}

// Find the latest keyframe index <= target.
int64_t prev_keyframe(const MofoVideo* v, int64_t target) {
  for (int64_t i = target; i >= 0; --i) {
    if (v->index[i].keyframe) return i;
  }
  return 0;
}

// Decode forward until frame `target` (by index) is produced; convert into
// out (RGB24, out_h x out_w x 3).
bool decode_to(MofoVideo* v, int64_t target, uint8_t* out) {
  if (v->cursor > target || v->cursor < 0 ||
      target - v->cursor > 256) {
    int64_t kf = prev_keyframe(v, target);
    if (v->cursor < 0 || kf > v->cursor || v->cursor > target) {
      av_seek_frame(v->fmt, v->stream_idx, v->index[kf].pts,
                    AVSEEK_FLAG_BACKWARD);
      avcodec_flush_buffers(v->codec);
      v->cursor = kf - 1;
      // cursor is a lower bound: we re-identify position by pts below
    }
  }

  AVPacket* pkt = av_packet_alloc();
  bool done = false;
  bool draining = false;
  while (!done) {
    int ret;
    if (!draining) {
      ret = av_read_frame(v->fmt, pkt);
      if (ret < 0) {
        draining = true;
        avcodec_send_packet(v->codec, nullptr);
      } else if (pkt->stream_index != v->stream_idx) {
        av_packet_unref(pkt);
        continue;
      } else {
        avcodec_send_packet(v->codec, pkt);
        av_packet_unref(pkt);
      }
    }
    while (true) {
      ret = avcodec_receive_frame(v->codec, v->frame);
      if (ret == AVERROR(EAGAIN)) break;
      if (ret == AVERROR_EOF) {
        done = true;  // drained without reaching target: fail below
        break;
      }
      if (ret < 0) {
        av_packet_free(&pkt);
        return false;
      }
      int64_t pts = v->frame->best_effort_timestamp != AV_NOPTS_VALUE
                        ? v->frame->best_effort_timestamp
                        : v->frame->pts;
      // locate this frame in the index by pts
      auto it = std::lower_bound(
          v->index.begin(), v->index.end(), pts,
          [](const FrameIndexEntry& e, int64_t p) { return e.pts < p; });
      int64_t pos = it - v->index.begin();
      if (pos < (int64_t)v->index.size() && v->index[pos].pts == pts) {
        v->cursor = pos;
      } else {
        v->cursor += 1;  // pts mismatch: fall back to counting
      }
      if (v->cursor == target) {
        uint8_t* dst[1] = {out};
        int dst_stride[1] = {v->out_w * 3};
        sws_scale(v->sws, v->frame->data, v->frame->linesize, 0,
                  v->src_h, dst, dst_stride);
        av_packet_free(&pkt);
        return true;
      }
      if (v->cursor > target) {
        // overshoot (bad pts ordering); restart decode from scratch
        av_packet_free(&pkt);
        return false;
      }
    }
    if (draining && done) break;
  }
  av_packet_free(&pkt);
  return false;
}

}  // namespace

extern "C" {

MofoVideo* mofo_open(const char* path, int out_w, int out_h) {
  auto* v = new MofoVideo();
  if (avformat_open_input(&v->fmt, path, nullptr, nullptr) < 0) {
    delete v;
    return nullptr;
  }
  if (avformat_find_stream_info(v->fmt, nullptr) < 0) {
    avformat_close_input(&v->fmt);
    delete v;
    return nullptr;
  }
  const AVCodec* dec = nullptr;
  v->stream_idx = av_find_best_stream(v->fmt, AVMEDIA_TYPE_VIDEO, -1, -1,
                                      &dec, 0);
  if (v->stream_idx < 0 || !dec) {
    avformat_close_input(&v->fmt);
    delete v;
    return nullptr;
  }
  AVStream* st = v->fmt->streams[v->stream_idx];
  v->codec = avcodec_alloc_context3(dec);
  avcodec_parameters_to_context(v->codec, st->codecpar);
  v->codec->thread_count = 1;
  if (avcodec_open2(v->codec, dec, nullptr) < 0) {
    avcodec_free_context(&v->codec);
    avformat_close_input(&v->fmt);
    delete v;
    return nullptr;
  }
  v->src_w = v->codec->width;
  v->src_h = v->codec->height;
  v->out_w = out_w > 0 ? out_w : v->src_w;
  v->out_h = out_h > 0 ? out_h : v->src_h;
  AVRational fr = st->avg_frame_rate.num
                      ? st->avg_frame_rate
                      : st->r_frame_rate;
  v->fps = fr.den ? (double)fr.num / fr.den : 0.0;
  v->frame = av_frame_alloc();
  v->rgb = av_frame_alloc();
  v->sws = sws_getContext(v->src_w, v->src_h, v->codec->pix_fmt, v->out_w,
                          v->out_h, AV_PIX_FMT_RGB24, SWS_BILINEAR,
                          nullptr, nullptr, nullptr);
  if (!v->sws || !build_index(v)) {
    // cleanup path shared with mofo_close
    if (v->sws) sws_freeContext(v->sws);
    av_frame_free(&v->frame);
    av_frame_free(&v->rgb);
    avcodec_free_context(&v->codec);
    avformat_close_input(&v->fmt);
    delete v;
    return nullptr;
  }
  return v;
}

int mofo_num_frames(MofoVideo* v) { return (int)v->index.size(); }
double mofo_fps(MofoVideo* v) { return v->fps; }
int mofo_width(MofoVideo* v) { return v->out_w; }
int mofo_height(MofoVideo* v) { return v->out_h; }

// indices need not be sorted or unique; out must hold n*out_h*out_w*3.
int mofo_get_batch(MofoVideo* v, const long* indices, int n,
                   unsigned char* out) {
  int frame_bytes = v->out_w * v->out_h * 3;
  // decode each unique index once, in ascending order
  std::vector<std::pair<long, int>> order(n);
  for (int i = 0; i < n; ++i) order[i] = {indices[i], i};
  std::sort(order.begin(), order.end());
  long prev = -1;
  std::vector<uint8_t> last(frame_bytes);
  for (auto& [idx, slot] : order) {
    if (idx < 0 || idx >= (long)v->index.size()) return -1;
    if (idx == prev) {
      std::memcpy(out + (size_t)slot * frame_bytes, last.data(),
                  frame_bytes);
      continue;
    }
    if (!decode_to(v, idx, last.data())) return -2;
    std::memcpy(out + (size_t)slot * frame_bytes, last.data(),
                frame_bytes);
    prev = idx;
  }
  return 0;
}

void mofo_close(MofoVideo* v) {
  if (!v) return;
  if (v->sws) sws_freeContext(v->sws);
  av_frame_free(&v->frame);
  av_frame_free(&v->rgb);
  avcodec_free_context(&v->codec);
  avformat_close_input(&v->fmt);
  delete v;
}

}  // extern "C"

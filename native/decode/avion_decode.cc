// avion_decode: host-side fused video decode for the AVION-TPU data path.
//
// TPU-native equivalent of the reference's forked decord "fused
// DecodeCrop" (third_party/decord submodule; API reconstructed from
// call sites avion/data/clip_dataset.py:30-54).  Differences by design:
//   - Crop/flip *parameters* are sampled in Python per clip (RRC / MSC /
//     center-crop policies) and passed down; the C++ side does the pixel
//     work: seek, decode, crop, scale, flip — so only crop-sized RGB
//     frames ever cross into Python (and then to the TPU as uint8).
//   - One crop per clip (the reference's per-clip crop consistency).
//   - Frame index is built by a packet scan at open() — exact seeking on
//     the 15-second chunk files the pipeline uses.
//
// C API (ctypes-friendly); all functions return 0 on success, negative
// on failure; avd_last_error() returns a static message.
//
// Build: make -C native/decode  (produces libavion_decode.so)

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libavutil/opt.h>
#include <libswscale/swscale.h>
}

#include <fcntl.h>
#include <unistd.h>

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <string>
#include <vector>

namespace {

struct FrameIndex {
  int64_t pts;
  bool keyframe;
};

struct Reader {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* codec = nullptr;
  int stream_idx = -1;
  std::vector<FrameIndex> index;  // presentation order
  double fps = 0.0;
  int width = 0;
  int height = 0;
  std::string error;
  // fast profile: loop filter skipped + fast bilinear scaling (training
  // augmentation tolerates both; ~1.5-2x decode speedup on H.264)
  bool fast = false;
  // cached decode state for sequential get_batch calls
  int64_t last_decoded_pts = INT64_MIN;
  int64_t last_decoded_idx = -1;  // frame index (presentation order)
};

thread_local std::string g_error;

void set_error(Reader* r, const std::string& msg) {
  if (r) r->error = msg;
  g_error = msg;
}

int build_index(Reader* r) {
  AVStream* st = r->fmt->streams[r->stream_idx];
  // Fast path: the mp4/mov sample table is already an exact frame index.
  // Its timestamps are DTS, which equal PTS only when the stream has no
  // frame reordering (video_delay == 0, e.g. bframes=0 re-encodes and
  // the mp4v test fixtures) — B-frame content falls back to the exact
  // packet scan.  Saves a full sequential read of the file at open().
  int n_entries = avformat_index_get_entries_count(st);
  if (n_entries > 0 && st->codecpar->video_delay == 0) {
    r->index.reserve(n_entries);
    for (int i = 0; i < n_entries; i++) {
      const AVIndexEntry* e = avformat_index_get_entry(st, i);
      if (e) r->index.push_back({e->timestamp,
                                 (e->flags & AVINDEX_KEYFRAME) != 0});
    }
  }
  if (r->index.empty()) {
    AVPacket* pkt = av_packet_alloc();
    while (av_read_frame(r->fmt, pkt) >= 0) {
      if (pkt->stream_index == r->stream_idx) {
        int64_t pts = pkt->pts != AV_NOPTS_VALUE ? pkt->pts : pkt->dts;
        r->index.push_back({pts, (pkt->flags & AV_PKT_FLAG_KEY) != 0});
      }
      av_packet_unref(pkt);
    }
    av_packet_free(&pkt);
  }
  std::sort(r->index.begin(), r->index.end(),
            [](const FrameIndex& a, const FrameIndex& b) { return a.pts < b.pts; });
  // rewind for decoding
  av_seek_frame(r->fmt, r->stream_idx, r->index.empty() ? 0 : r->index.front().pts,
                AVSEEK_FLAG_BACKWARD);
  return r->index.empty() ? -1 : 0;
}

}  // namespace

extern "C" {

void* avd_open_impl(const char* path, int num_threads, int fast) {
  // kernel readahead of the whole chunk file (a few MB at 15 s 456x256)
  // so page-ins overlap the first packets' decode instead of stalling
  // the index scan and the first get_batch
  int fd = ::open(path, O_RDONLY);
  if (fd >= 0) {
    posix_fadvise(fd, 0, 0, POSIX_FADV_WILLNEED);
    ::close(fd);
  }
  auto* r = new Reader();
  r->fast = fast != 0;
  if (avformat_open_input(&r->fmt, path, nullptr, nullptr) < 0) {
    set_error(nullptr, std::string("cannot open ") + path);
    delete r;
    return nullptr;
  }
  if (avformat_find_stream_info(r->fmt, nullptr) < 0) {
    set_error(nullptr, "no stream info");
    avformat_close_input(&r->fmt);
    delete r;
    return nullptr;
  }
  const AVCodec* dec = nullptr;
  r->stream_idx =
      av_find_best_stream(r->fmt, AVMEDIA_TYPE_VIDEO, -1, -1, &dec, 0);
  if (r->stream_idx < 0 || !dec) {
    set_error(nullptr, "no video stream");
    avformat_close_input(&r->fmt);
    delete r;
    return nullptr;
  }
  AVStream* st = r->fmt->streams[r->stream_idx];
  r->codec = avcodec_alloc_context3(dec);
  avcodec_parameters_to_context(r->codec, st->codecpar);
  r->codec->thread_count = num_threads > 0 ? num_threads : 1;
  r->codec->thread_type = FF_THREAD_FRAME | FF_THREAD_SLICE;
  if (r->fast) {
    // in-loop deblocking costs ~25-40% of H.264 decode; artifacts are
    // negligible after the 456->224 downscale of training crops
    r->codec->skip_loop_filter = AVDISCARD_ALL;
    r->codec->flags2 |= AV_CODEC_FLAG2_FAST;
  }
  if (avcodec_open2(r->codec, dec, nullptr) < 0) {
    set_error(nullptr, "cannot open codec");
    avformat_close_input(&r->fmt);
    delete r;
    return nullptr;
  }
  r->width = r->codec->width;
  r->height = r->codec->height;
  AVRational fr = av_guess_frame_rate(r->fmt, st, nullptr);
  r->fps = fr.den > 0 ? av_q2d(fr) : 30.0;
  if (build_index(r) < 0) {
    set_error(nullptr, "empty stream index");
    avcodec_free_context(&r->codec);
    avformat_close_input(&r->fmt);
    delete r;
    return nullptr;
  }
  return r;
}

void* avd_open(const char* path, int num_threads) {
  return avd_open_impl(path, num_threads, 0);
}

void* avd_open_fast(const char* path, int num_threads) {
  return avd_open_impl(path, num_threads, 1);
}

int avd_frame_count(void* h) {
  return h ? (int)((Reader*)h)->index.size() : -1;
}

double avd_fps(void* h) { return h ? ((Reader*)h)->fps : 0.0; }
int avd_width(void* h) { return h ? ((Reader*)h)->width : -1; }
int avd_height(void* h) { return h ? ((Reader*)h)->height : -1; }

const char* avd_last_error(void* h) {
  if (h && !((Reader*)h)->error.empty()) return ((Reader*)h)->error.c_str();
  return g_error.c_str();
}

// Fused get_batch: decode the frames in `indices` (0-based, presentation
// order), crop the normalized region (cx, cy, cw, ch) from each decoded
// frame, scale to out_w x out_h RGB24, apply flips, and write into `out`
// (n * out_h * out_w * 3 bytes, frame-major).
int avd_get_batch(void* h, const int64_t* indices, int n, float cx, float cy,
                  float cw, float ch, int hflip, int vflip, int out_w,
                  int out_h, uint8_t* out) {
  if (!h) return -1;
  auto* r = (Reader*)h;
  const int nframes = (int)r->index.size();
  if (n <= 0) return 0;

  // clamp + unique-sort the wanted frames
  std::vector<int64_t> want(indices, indices + n);
  for (auto& w : want) w = std::min<int64_t>(std::max<int64_t>(w, 0), nframes - 1);
  std::vector<int64_t> uniq = want;
  std::sort(uniq.begin(), uniq.end());
  uniq.erase(std::unique(uniq.begin(), uniq.end()), uniq.end());

  // source crop rect in pixels (even-aligned for yuv chroma safety)
  int sx = ((int)(cx * r->width)) & ~1;
  int sy = ((int)(cy * r->height)) & ~1;
  int sw = ((int)(cw * r->width)) & ~1;
  int sh = ((int)(ch * r->height)) & ~1;
  sw = std::max(2, std::min(sw, r->width - sx));
  sh = std::max(2, std::min(sh, r->height - sy));

  SwsContext* sws = nullptr;
  AVPixelFormat last_fmt = AV_PIX_FMT_NONE;

  // seek: find latest keyframe <= first wanted frame; skip the seek when
  // the decoder is already positioned just before it (sequential reads)
  int64_t first = uniq.front();
  int kf = (int)first;
  while (kf > 0 && !r->index[kf].keyframe) kf--;
  int64_t seek_pts = r->index[kf].pts;
  // seek when the first wanted frame is at/behind the current position
  // (must rewind) or far ahead (cheaper to jump); otherwise decode forward
  const bool need_seek =
      r->last_decoded_idx < 0 || first <= r->last_decoded_idx ||
      first > r->last_decoded_idx + 300;
  if (need_seek) {
    av_seek_frame(r->fmt, r->stream_idx, seek_pts, AVSEEK_FLAG_BACKWARD);
    avcodec_flush_buffers(r->codec);
    r->last_decoded_pts = INT64_MIN;
    r->last_decoded_idx = -1;
  }

  AVPacket* pkt = av_packet_alloc();
  AVFrame* frame = av_frame_alloc();
  std::vector<uint8_t> scaled((size_t)out_w * out_h * 3);
  size_t found = 0;
  std::vector<char> found_mask(uniq.size(), 0);
  std::vector<int64_t> wanted_pts(uniq.size());
  for (size_t i = 0; i < uniq.size(); i++) wanted_pts[i] = r->index[uniq[i]].pts;

  auto emit = [&](AVFrame* f, size_t uniq_pos) {
    // crop by plane-pointer offset, then scale
    AVPixelFormat fmt = (AVPixelFormat)f->format;
    if (!sws || fmt != last_fmt) {
      if (sws) sws_freeContext(sws);
      sws = sws_getContext(sw, sh, fmt, out_w, out_h, AV_PIX_FMT_RGB24,
                           r->fast ? SWS_FAST_BILINEAR : SWS_BILINEAR,
                           nullptr, nullptr, nullptr);
      last_fmt = fmt;
    }
    const AVPixFmtDescriptor* desc = av_pix_fmt_desc_get(fmt);
    const uint8_t* src_data[4] = {nullptr, nullptr, nullptr, nullptr};
    for (int p = 0; p < 4 && f->data[p]; p++) {
      int xs = (p == 1 || p == 2) ? desc->log2_chroma_w : 0;
      int ys = (p == 1 || p == 2) ? desc->log2_chroma_h : 0;
      src_data[p] = f->data[p] + (sy >> ys) * f->linesize[p] + ((sx >> xs) *
                    ((p == 0 && desc->comp[0].step > 1) ? desc->comp[0].step : 1));
    }
    int64_t fidx = uniq[uniq_pos];
    int first_slot = -1;
    for (int oi = 0; oi < n; oi++)
      if (want[oi] == fidx) { first_slot = oi; break; }
    if (first_slot < 0) return;
    uint8_t* first_base = out + (size_t)first_slot * out_h * out_w * 3;

    if (!hflip) {
      // scale straight into the output slot (vflip via negative
      // stride), skipping the intermediate row-copy pass entirely
      uint8_t* dst[1] = {vflip
                             ? first_base + (size_t)(out_h - 1) * out_w * 3
                             : first_base};
      int dst_stride[1] = {vflip ? -(out_w * 3) : out_w * 3};
      sws_scale(sws, src_data, f->linesize, 0, sh, dst, dst_stride);
    } else {
      uint8_t* dst[1] = {scaled.data()};
      int dst_stride[1] = {out_w * 3};
      sws_scale(sws, src_data, f->linesize, 0, sh, dst, dst_stride);
      for (int y = 0; y < out_h; y++) {
        int sy2 = vflip ? (out_h - 1 - y) : y;
        const uint8_t* srow = scaled.data() + (size_t)sy2 * out_w * 3;
        uint8_t* drow = first_base + (size_t)y * out_w * 3;
        for (int x = 0; x < out_w; x++) {
          const uint8_t* sp = srow + (size_t)(out_w - 1 - x) * 3;
          uint8_t* dp = drow + (size_t)x * 3;
          dp[0] = sp[0]; dp[1] = sp[1]; dp[2] = sp[2];
        }
      }
    }
    // duplicate-frame slots copy from the first
    for (int oi = first_slot + 1; oi < n; oi++) {
      if (want[oi] != fidx) continue;
      memcpy(out + (size_t)oi * out_h * out_w * 3, first_base,
             (size_t)out_h * out_w * 3);
    }
  };

  // Fast-forward policy: while the next not-yet-found wanted frame is
  // far ahead of the decode position, tell the decoder to skip
  // non-reference frames (typically B-frames — x264-default chunk
  // re-encodes carry 3 of them).  Safety margin: packets are sent in
  // decode order, which leads presentation order by at most the
  // reorder depth, and FRAME THREADING pipelines thread_count-1 more
  // frames between send and receive, so last_decoded_idx lags the send
  // position by up to reorder+threads-1 — the gap threshold must cover
  // both or a wanted non-ref frame's packet is sent with skipping ON
  // and silently dropped (seen as "decoded k/n wanted frames" at
  // decode_threads=4 on gop-250 streams).
  const int reorder = std::max(r->codec->has_b_frames,
                               (int)r->codec->delay);
  const int thread_lag =
      r->codec->thread_count > 1 ? r->codec->thread_count - 1 : 0;
  const int skip_gap = reorder + thread_lag + 2;
  auto next_wanted_idx = [&]() -> int64_t {
    for (size_t i = 0; i < uniq.size(); i++)
      if (!found_mask[i]) return uniq[i];
    return nframes;
  };

  // decode forward until all wanted frames are emitted
  auto run_pass = [&](bool allow_skip) {
    bool draining = false;
    while (found < uniq.size()) {
      if (!draining) {
        int ret = av_read_frame(r->fmt, pkt);
        if (ret < 0) {
          avcodec_send_packet(r->codec, nullptr);  // enter drain mode
          draining = true;
        } else {
          if (pkt->stream_index != r->stream_idx) {
            av_packet_unref(pkt);
            continue;
          }
          r->codec->skip_frame =
              (allow_skip && r->last_decoded_idx >= 0 &&
               next_wanted_idx() - r->last_decoded_idx > skip_gap)
                  ? AVDISCARD_NONREF
                  : AVDISCARD_DEFAULT;
          avcodec_send_packet(r->codec, pkt);
          av_packet_unref(pkt);
        }
      }
      int ret;
      while ((ret = avcodec_receive_frame(r->codec, frame)) >= 0) {
        int64_t pts = frame->best_effort_timestamp != AV_NOPTS_VALUE
                          ? frame->best_effort_timestamp
                          : frame->pts;
        r->last_decoded_pts = pts;
        {
          auto pit = std::lower_bound(
              r->index.begin(), r->index.end(), pts,
              [](const FrameIndex& a, int64_t v) { return a.pts < v; });
          if (pit != r->index.end() && pit->pts == pts)
            r->last_decoded_idx = pit - r->index.begin();
        }
        auto it = std::lower_bound(wanted_pts.begin(), wanted_pts.end(), pts);
        if (it != wanted_pts.end() && *it == pts &&
            !found_mask[it - wanted_pts.begin()]) {
          emit(frame, (size_t)(it - wanted_pts.begin()));
          found_mask[it - wanted_pts.begin()] = 1;
          found++;
        }
        av_frame_unref(frame);
        if (found == uniq.size()) break;
      }
      if (draining && ret == AVERROR_EOF) break;
    }
  };
  run_pass(true);
  if (found < uniq.size()) {
    // rescue: the fast-forward margin is a heuristic (codecs may not
    // report their full pipeline depth) — redo the missing frames
    // exactly, from the keyframe, with skipping off
    av_seek_frame(r->fmt, r->stream_idx, seek_pts, AVSEEK_FLAG_BACKWARD);
    avcodec_flush_buffers(r->codec);
    r->last_decoded_pts = INT64_MIN;
    r->last_decoded_idx = -1;
    run_pass(false);
  }

  r->codec->skip_frame = AVDISCARD_DEFAULT;
  if (sws) sws_freeContext(sws);
  av_frame_free(&frame);
  av_packet_free(&pkt);
  if (found < uniq.size()) {
    set_error(r, "decoded " + std::to_string(found) + "/" +
                     std::to_string(uniq.size()) + " wanted frames");
    return -2;
  }
  return 0;
}

void avd_close(void* h) {
  if (!h) return;
  auto* r = (Reader*)h;
  if (r->codec) avcodec_free_context(&r->codec);
  if (r->fmt) avformat_close_input(&r->fmt);
  delete r;
}

// Test-fixture encoder: writes an mpeg4 .mp4 with a chosen GOP size and
// B-frame count (the only encoder guaranteed present in libavcodec).
// Exists because the CI image has no H.264 encoder, and exercising the
// NONREF fast-forward path + keyframe walk-back requires B-frame /
// sparse-keyframe content.  Frames are deterministic: frame i has a
// vertical bar at x = (i * 7) % w over a per-frame flat gray level, so
// frames are visually distinct and re-identifiable after lossy coding.
static int write_test_video_impl(const char* path, int n_frames, int w,
                                 int h, int fps, int gop, int bframes,
                                 const char* codec_name, int noise,
                                 uint32_t seed) {
  const AVCodec* enc = codec_name && codec_name[0]
                           ? avcodec_find_encoder_by_name(codec_name)
                           : avcodec_find_encoder(AV_CODEC_ID_MPEG4);
  if (!enc) { g_error = "encoder unavailable"; return -1; }
  AVFormatContext* fmt = nullptr;
  if (avformat_alloc_output_context2(&fmt, nullptr, nullptr, path) < 0 ||
      !fmt) { g_error = "alloc output"; return -1; }
  AVStream* st = avformat_new_stream(fmt, nullptr);
  AVCodecContext* c = avcodec_alloc_context3(enc);
  c->width = w; c->height = h;
  c->pix_fmt = AV_PIX_FMT_YUV420P;
  c->time_base = {1, fps};
  c->gop_size = gop;
  c->max_b_frames = bframes;
  c->bit_rate = (int64_t)w * h * fps / 4;
  if (fmt->oformat->flags & AVFMT_GLOBALHEADER)
    c->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
  AVDictionary* opts = nullptr;
  if (enc->id == AV_CODEC_ID_H264) {
    // x264-default-like production re-encode profile (the chunked
    // datasets the reference prepares); CRF mode ignores bit_rate.
    // b_strategy 0 forces the requested B-frame cadence even on
    // synthetic content (real video carries 40-60% B-frames, the
    // frames the NONREF fast-forward path skips)
    av_dict_set(&opts, "preset", "veryfast", 0);
    av_dict_set(&opts, "crf", "23", 0);
    av_dict_set(&opts, "b_strategy", "0", 0);
  }
  if (avcodec_open2(c, enc, &opts) < 0) {
    av_dict_free(&opts);
    g_error = "cannot open encoder";
    avcodec_free_context(&c); avformat_free_context(fmt); return -1;
  }
  av_dict_free(&opts);
  avcodec_parameters_from_context(st->codecpar, c);
  st->time_base = c->time_base;
  if (!(fmt->oformat->flags & AVFMT_NOFILE) &&
      avio_open(&fmt->pb, path, AVIO_FLAG_WRITE) < 0) {
    g_error = "avio_open"; avcodec_free_context(&c);
    avformat_free_context(fmt); return -1;
  }
  avformat_write_header(fmt, nullptr);
  AVFrame* f = av_frame_alloc();
  f->format = c->pix_fmt; f->width = w; f->height = h;
  av_frame_get_buffer(f, 0);
  AVPacket* pkt = av_packet_alloc();
  auto flush_enc = [&](AVFrame* fr) {
    avcodec_send_frame(c, fr);
    while (avcodec_receive_packet(c, pkt) >= 0) {
      av_packet_rescale_ts(pkt, c->time_base, st->time_base);
      pkt->stream_index = st->index;
      av_interleaved_write_frame(fmt, pkt);
      av_packet_unref(pkt);
    }
  };
  // noise mode: textured content with per-frame drift — realistic
  // bitrate/motion for decode benchmarks (the flat-gray fixture
  // compresses to almost nothing and under-stresses the decoder)
  std::vector<uint8_t> tex;
  if (noise) {
    tex.resize((size_t)(w + 256) * h);
    uint32_t st = seed ? seed : 12345;
    for (auto& b : tex) { st = st * 1664525u + 1013904223u; b = st >> 24; }
  }
  // per-seed chroma + bar phase so seeded videos are visually distinct
  // classes (learnable synthetic datasets for e2e convergence runs)
  uint8_t u_val = seed ? (uint8_t)(64 + (seed * 37u) % 128) : 128;
  uint8_t v_val = seed ? (uint8_t)(64 + (seed * 73u) % 128) : 128;
  int bar_phase = seed ? (int)(seed % (uint32_t)w) : 0;
  for (int i = 0; i < n_frames; i++) {
    av_frame_make_writable(f);
    uint8_t lum = (uint8_t)(40 + (i * 13) % 160);
    int bar = (bar_phase + i * 7) % w;
    for (int y = 0; y < h; y++) {
      if (noise) {
        const uint8_t* src = tex.data() + (size_t)y * (w + 256) + (i % 256);
        uint8_t* dst = f->data[0] + (size_t)y * f->linesize[0];
        for (int x = 0; x < w; x++)
          dst[x] = (uint8_t)((src[x] >> 1) + (lum >> 1));
      } else {
        memset(f->data[0] + y * f->linesize[0], lum, w);
      }
      for (int x = bar; x < std::min(w, bar + 8); x++)
        f->data[0][y * f->linesize[0] + x] = 235;
    }
    memset(f->data[1], u_val, (size_t)f->linesize[1] * h / 2);
    memset(f->data[2], v_val, (size_t)f->linesize[2] * h / 2);
    f->pts = i;
    flush_enc(f);
  }
  flush_enc(nullptr);  // drain
  av_write_trailer(fmt);
  av_packet_free(&pkt);
  av_frame_free(&f);
  avcodec_free_context(&c);
  if (!(fmt->oformat->flags & AVFMT_NOFILE)) avio_closep(&fmt->pb);
  avformat_free_context(fmt);
  return 0;
}

int avd_write_test_video_codec(const char* path, int n_frames, int w, int h,
                               int fps, int gop, int bframes,
                               const char* codec_name, int noise) {
  return write_test_video_impl(path, n_frames, w, h, fps, gop, bframes,
                               codec_name, noise, 0);
}

int avd_write_test_video_seeded(const char* path, int n_frames, int w, int h,
                                int fps, int gop, int bframes,
                                const char* codec_name, int noise,
                                uint32_t seed) {
  return write_test_video_impl(path, n_frames, w, h, fps, gop, bframes,
                               codec_name, noise, seed);
}

int avd_write_test_video(const char* path, int n_frames, int w, int h,
                         int fps, int gop, int bframes) {
  return write_test_video_impl(path, n_frames, w, h, fps, gop, bframes,
                               nullptr, 0, 0);
}

}  // extern "C"

// mervideo: native video frontend for mertools_tpu (libav-based).
//
// Replaces three external native tools of the reference:
//  - the ffmpeg binary for video->16k-mono-wav demux
//    (MERBench/toolkit/utils/functions.py:269-277),
//  - decord for frame-accurate video decode
//    (MER2025/MER2025_Track23/inference_hybird.py:14-15),
//  - ffmpeg re-encode/mux in the noise-corruption pipeline
//    (MER2023/main-corrupt.py:84-130).
//
// C ABI consumed via ctypes (mertools_tpu/io/video.py). All returned buffers
// are malloc'd and released with mer_free().
//
// Build: make -C native  (links avformat/avcodec/avutil/swscale/swresample)

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libavutil/opt.h>
#include <libswresample/swresample.h>
#include <libswscale/swscale.h>
}

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Demux {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* dec = nullptr;
  int stream_index = -1;

  ~Demux() {
    if (dec) avcodec_free_context(&dec);
    if (fmt) avformat_close_input(&fmt);
  }

  int open(const char* path, AVMediaType type) {
    if (avformat_open_input(&fmt, path, nullptr, nullptr) < 0) return -1;
    if (avformat_find_stream_info(fmt, nullptr) < 0) return -2;
    stream_index = av_find_best_stream(fmt, type, -1, -1, nullptr, 0);
    if (stream_index < 0) return -3;
    const AVCodec* codec =
        avcodec_find_decoder(fmt->streams[stream_index]->codecpar->codec_id);
    if (!codec) return -4;
    dec = avcodec_alloc_context3(codec);
    if (!dec) return -5;
    if (avcodec_parameters_to_context(dec, fmt->streams[stream_index]->codecpar) < 0)
      return -6;
    if (avcodec_open2(dec, codec, nullptr) < 0) return -7;
    return 0;
  }
};

}  // namespace

extern "C" {

void mer_free(void* p) { free(p); }

// Basic stream info. Returns 0 on success.
int mer_video_info(const char* path, int* w, int* h, double* fps,
                   int64_t* n_frames, int* has_audio) {
  Demux d;
  int rc = d.open(path, AVMEDIA_TYPE_VIDEO);
  if (rc != 0) return rc;
  AVStream* st = d.fmt->streams[d.stream_index];
  *w = d.dec->width;
  *h = d.dec->height;
  AVRational r = st->avg_frame_rate.num ? st->avg_frame_rate : st->r_frame_rate;
  *fps = r.den ? av_q2d(r) : 0.0;
  *n_frames = st->nb_frames;  // 0 when unknown; caller decodes to count
  *has_audio =
      av_find_best_stream(d.fmt, AVMEDIA_TYPE_AUDIO, -1, -1, nullptr, 0) >= 0;
  return 0;
}

// Decode ALL frames as packed RGB24 (n, h, w, 3). If max_frames > 0 and the
// clip is longer, frames are uniformly subsampled on the fly (matching
// resample_frames_uniform semantics, extract_vision_huggingface.py:44-56).
int mer_decode_frames(const char* path, int max_frames, uint8_t** out_rgb,
                      int* out_n, int* out_w, int* out_h) {
  Demux d;
  int rc = d.open(path, AVMEDIA_TYPE_VIDEO);
  if (rc != 0) return rc;
  const int w = d.dec->width, h = d.dec->height;

  SwsContext* sws =
      sws_getContext(w, h, d.dec->pix_fmt, w, h, AV_PIX_FMT_RGB24,
                     SWS_BILINEAR, nullptr, nullptr, nullptr);
  if (!sws) return -8;

  std::vector<uint8_t> frames;  // appended rgb planes
  AVPacket* pkt = av_packet_alloc();
  AVFrame* frm = av_frame_alloc();
  const size_t frame_bytes = static_cast<size_t>(w) * h * 3;
  std::vector<uint8_t> rgb(frame_bytes);

  auto drain = [&](void) {
    while (avcodec_receive_frame(d.dec, frm) == 0) {
      uint8_t* dst[1] = {rgb.data()};
      int dst_stride[1] = {w * 3};
      sws_scale(sws, frm->data, frm->linesize, 0, h, dst, dst_stride);
      frames.insert(frames.end(), rgb.begin(), rgb.end());
    }
  };
  while (av_read_frame(d.fmt, pkt) >= 0) {
    if (pkt->stream_index == d.stream_index) {
      int s = avcodec_send_packet(d.dec, pkt);
      while (s == AVERROR(EAGAIN)) {  // decoder full: drain then retry
        drain();
        s = avcodec_send_packet(d.dec, pkt);
      }
      drain();
    }
    av_packet_unref(pkt);
  }
  avcodec_send_packet(d.dec, nullptr);  // flush
  drain();
  av_packet_free(&pkt);
  av_frame_free(&frm);
  sws_freeContext(sws);

  int n = static_cast<int>(frames.size() / frame_bytes);
  if (n == 0) return -9;

  int keep = (max_frames > 0 && n > max_frames) ? max_frames : n;
  uint8_t* out = static_cast<uint8_t*>(malloc(frame_bytes * keep));
  if (!out) return -10;
  for (int i = 0; i < keep; ++i) {
    int src = (keep == n) ? i
                          : static_cast<int>(static_cast<int64_t>(i) * n / keep);
    if (src >= n) src = n - 1;
    memcpy(out + frame_bytes * i, frames.data() + frame_bytes * src,
           frame_bytes);
  }
  *out_rgb = out;
  *out_n = keep;
  *out_w = w;
  *out_h = h;
  return 0;
}

// Demux + decode the audio stream to mono float32 at its native rate
// (resampling to 16 kHz happens in libmeraudio / JAX).
int mer_demux_audio(const char* path, float** out, int64_t* out_n,
                    int* out_sr) {
  Demux d;
  int rc = d.open(path, AVMEDIA_TYPE_AUDIO);
  if (rc != 0) return rc;
  const int sr = d.dec->sample_rate;

  SwrContext* swr = nullptr;
  AVChannelLayout mono = AV_CHANNEL_LAYOUT_MONO;
  AVChannelLayout in_layout;
  if (d.dec->ch_layout.nb_channels > 0)
    av_channel_layout_copy(&in_layout, &d.dec->ch_layout);
  else
    av_channel_layout_default(&in_layout, 1);
  if (swr_alloc_set_opts2(&swr, &mono, AV_SAMPLE_FMT_FLT, sr, &in_layout,
                          d.dec->sample_fmt, sr, 0, nullptr) < 0 ||
      swr_init(swr) < 0)
    return -8;

  std::vector<float> samples;
  AVPacket* pkt = av_packet_alloc();
  AVFrame* frm = av_frame_alloc();
  std::vector<float> buf;

  auto drain = [&](void) {
    while (avcodec_receive_frame(d.dec, frm) == 0) {
      int max_out = swr_get_out_samples(swr, frm->nb_samples);
      buf.resize(static_cast<size_t>(max_out > 0 ? max_out : frm->nb_samples));
      uint8_t* outp[1] = {reinterpret_cast<uint8_t*>(buf.data())};
      int got = swr_convert(swr, outp, static_cast<int>(buf.size()),
                            const_cast<const uint8_t**>(frm->extended_data),
                            frm->nb_samples);
      if (got > 0) samples.insert(samples.end(), buf.begin(), buf.begin() + got);
    }
  };
  while (av_read_frame(d.fmt, pkt) >= 0) {
    if (pkt->stream_index == d.stream_index) {
      int s = avcodec_send_packet(d.dec, pkt);
      while (s == AVERROR(EAGAIN)) {
        drain();
        s = avcodec_send_packet(d.dec, pkt);
      }
      drain();
    }
    av_packet_unref(pkt);
  }
  avcodec_send_packet(d.dec, nullptr);
  drain();
  // flush the resampler
  buf.resize(4096);
  for (;;) {
    uint8_t* outp[1] = {reinterpret_cast<uint8_t*>(buf.data())};
    int got = swr_convert(swr, outp, static_cast<int>(buf.size()), nullptr, 0);
    if (got <= 0) break;
    samples.insert(samples.end(), buf.begin(), buf.begin() + got);
  }
  av_packet_free(&pkt);
  av_frame_free(&frm);
  swr_free(&swr);

  if (samples.empty()) return -9;
  float* out_buf = static_cast<float*>(malloc(samples.size() * sizeof(float)));
  if (!out_buf) return -10;
  memcpy(out_buf, samples.data(), samples.size() * sizeof(float));
  *out = out_buf;
  *out_n = static_cast<int64_t>(samples.size());
  *out_sr = sr;
  return 0;
}

// Encode packed RGB24 frames (n, h, w, 3) + optional mono float audio into a
// container chosen by extension (.mp4/.avi). Used by the corruption pipeline
// (blur + re-encode + AV mux, main-corrupt.py:84-130).
int mer_encode_video(const char* path, const uint8_t* rgb, int n, int w,
                     int h, double fps, const float* audio, int64_t n_audio,
                     int audio_sr) {
  AVFormatContext* fmt = nullptr;
  if (avformat_alloc_output_context2(&fmt, nullptr, nullptr, path) < 0 || !fmt)
    return -1;

  // --- video stream (mpeg4: patent-free encoder always present)
  const AVCodec* vcodec = avcodec_find_encoder(AV_CODEC_ID_MPEG4);
  if (!vcodec) return -2;
  AVStream* vst = avformat_new_stream(fmt, nullptr);
  AVCodecContext* venc = avcodec_alloc_context3(vcodec);
  venc->width = w;
  venc->height = h;
  venc->pix_fmt = AV_PIX_FMT_YUV420P;
  venc->time_base = av_d2q(1.0 / fps, 100000);
  venc->framerate = av_d2q(fps, 100000);
  venc->bit_rate = 2'000'000;
  venc->gop_size = 12;
  if (fmt->oformat->flags & AVFMT_GLOBALHEADER)
    venc->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
  if (avcodec_open2(venc, vcodec, nullptr) < 0) return -3;
  avcodec_parameters_from_context(vst->codecpar, venc);
  vst->time_base = venc->time_base;

  // --- audio stream (optional)
  AVCodecContext* aenc = nullptr;
  AVStream* ast = nullptr;
  SwrContext* swr = nullptr;
  if (audio && n_audio > 0) {
    const AVCodec* acodec = avcodec_find_encoder(AV_CODEC_ID_AAC);
    if (acodec) {
      ast = avformat_new_stream(fmt, nullptr);
      aenc = avcodec_alloc_context3(acodec);
      aenc->sample_rate = audio_sr;
      AVChannelLayout mono = AV_CHANNEL_LAYOUT_MONO;
      av_channel_layout_copy(&aenc->ch_layout, &mono);
      aenc->sample_fmt = acodec->sample_fmts ? acodec->sample_fmts[0]
                                             : AV_SAMPLE_FMT_FLTP;
      aenc->bit_rate = 96000;
      aenc->time_base = AVRational{1, audio_sr};
      if (fmt->oformat->flags & AVFMT_GLOBALHEADER)
        aenc->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
      if (avcodec_open2(aenc, acodec, nullptr) < 0) {
        avcodec_free_context(&aenc);
        aenc = nullptr;
        ast = nullptr;
      } else {
        avcodec_parameters_from_context(ast->codecpar, aenc);
        ast->time_base = aenc->time_base;
        AVChannelLayout mono2 = AV_CHANNEL_LAYOUT_MONO;
        swr_alloc_set_opts2(&swr, &mono2, aenc->sample_fmt, audio_sr, &mono2,
                            AV_SAMPLE_FMT_FLT, audio_sr, 0, nullptr);
        swr_init(swr);
      }
    }
  }

  if (!(fmt->oformat->flags & AVFMT_NOFILE) &&
      avio_open(&fmt->pb, path, AVIO_FLAG_WRITE) < 0)
    return -4;
  if (avformat_write_header(fmt, nullptr) < 0) return -5;

  AVPacket* pkt = av_packet_alloc();
  // default_dur: per-packet duration in enc time_base (1 frame / frame_size
  // samples). Without it the mov muxer writes a short edit list that clips
  // the final sample on demux.
  auto write_packets = [&](AVCodecContext* enc, AVStream* st,
                           int64_t default_dur) {
    while (avcodec_receive_packet(enc, pkt) == 0) {
      if (pkt->duration == 0) pkt->duration = default_dur;
      av_packet_rescale_ts(pkt, enc->time_base, st->time_base);
      pkt->stream_index = st->index;
      av_interleaved_write_frame(fmt, pkt);
      av_packet_unref(pkt);
    }
  };

  // video frames
  SwsContext* sws = sws_getContext(w, h, AV_PIX_FMT_RGB24, w, h,
                                   AV_PIX_FMT_YUV420P, SWS_BILINEAR, nullptr,
                                   nullptr, nullptr);
  AVFrame* vfrm = av_frame_alloc();
  vfrm->format = AV_PIX_FMT_YUV420P;
  vfrm->width = w;
  vfrm->height = h;
  av_frame_get_buffer(vfrm, 0);
  const size_t frame_bytes = static_cast<size_t>(w) * h * 3;
  for (int i = 0; i < n; ++i) {
    const uint8_t* src[1] = {rgb + frame_bytes * i};
    int src_stride[1] = {w * 3};
    av_frame_make_writable(vfrm);
    sws_scale(sws, src, src_stride, 0, h, vfrm->data, vfrm->linesize);
    vfrm->pts = i;
    int s = avcodec_send_frame(venc, vfrm);
    while (s == AVERROR(EAGAIN)) {
      write_packets(venc, vst, 1);
      s = avcodec_send_frame(venc, vfrm);
    }
    write_packets(venc, vst, 1);
  }
  avcodec_send_frame(venc, nullptr);
  write_packets(venc, vst, 1);
  av_frame_free(&vfrm);
  sws_freeContext(sws);

  // audio frames
  if (aenc) {
    const int fs = aenc->frame_size > 0 ? aenc->frame_size : 1024;
    AVFrame* afrm = av_frame_alloc();
    afrm->format = aenc->sample_fmt;
    av_channel_layout_copy(&afrm->ch_layout, &aenc->ch_layout);
    afrm->sample_rate = audio_sr;
    afrm->nb_samples = fs;
    av_frame_get_buffer(afrm, 0);
    int64_t pos = 0, pts = 0;
    std::vector<float> chunk(fs);
    while (pos < n_audio) {
      int m = static_cast<int>(std::min<int64_t>(fs, n_audio - pos));
      memcpy(chunk.data(), audio + pos, m * sizeof(float));
      memset(chunk.data() + m, 0, (fs - m) * sizeof(float));
      av_frame_make_writable(afrm);
      const uint8_t* in[1] = {reinterpret_cast<const uint8_t*>(chunk.data())};
      swr_convert(swr, afrm->data, fs, in, fs);
      afrm->pts = pts;
      pts += fs;
      pos += m;
      int s = avcodec_send_frame(aenc, afrm);
      while (s == AVERROR(EAGAIN)) {
        write_packets(aenc, ast, aenc->frame_size > 0 ? aenc->frame_size : 1024);
        s = avcodec_send_frame(aenc, afrm);
      }
      write_packets(aenc, ast, aenc->frame_size > 0 ? aenc->frame_size : 1024);
    }
    avcodec_send_frame(aenc, nullptr);
    write_packets(aenc, ast, aenc->frame_size > 0 ? aenc->frame_size : 1024);
    av_frame_free(&afrm);
  }

  av_write_trailer(fmt);
  av_packet_free(&pkt);
  avcodec_free_context(&venc);
  if (aenc) avcodec_free_context(&aenc);
  if (swr) swr_free(&swr);
  if (!(fmt->oformat->flags & AVFMT_NOFILE)) avio_closep(&fmt->pb);
  avformat_free_context(fmt);
  return 0;
}

}  // extern "C"

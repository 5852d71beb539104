// Tiny MP4 encoder tool: writes a genuine compressed bitstream demo asset
// (assets/video_demo.mp4) so quick_start.py and the video IO path exercise a
// real container + codec instead of synthesized frames — the zero-egress
// stand-in for the reference's shipped demo media (reference
// scripts/quick_start.py:20-28 loads assets/*.mp4).
//
// Standalone main(), built on demand by scripts/make_demo_assets.py with the
// same system FFmpeg dev libs the in-repo decoder (videodec.cpp) links.
// Frames are a moving color-gradient pattern generated directly in YUV420P
// (no swscale dependency). Encoder: MPEG-4 part 2 (baked into every FFmpeg),
// MJPEG fallback.
//
// Usage: videoenc <out.mp4> [frames] [size] [fps]

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libavutil/opt.h>
}

#include <cmath>
#include <cstdio>
#include <cstring>

static void fill_frame(AVFrame* f, int i, int w, int h) {
  // moving diagonal gradient + a drifting bright square (enough texture that
  // the codec produces a non-trivial bitstream and decoders have real work)
  for (int y = 0; y < h; ++y)
    for (int x = 0; x < w; ++x)
      f->data[0][y * f->linesize[0] + x] =
          (uint8_t)((x + y + 4 * i) & 0xFF);
  int cx = (8 + 3 * i) % (w - 16), cy = (8 + 2 * i) % (h - 16);
  for (int y = cy; y < cy + 12 && y < h; ++y)
    for (int x = cx; x < cx + 12 && x < w; ++x)
      f->data[0][y * f->linesize[0] + x] = 235;
  for (int y = 0; y < h / 2; ++y)
    for (int x = 0; x < w / 2; ++x) {
      f->data[1][y * f->linesize[1] + x] = (uint8_t)(64 + ((x + 2 * i) & 0x7F));
      f->data[2][y * f->linesize[2] + x] = (uint8_t)(64 + ((y + 3 * i) & 0x7F));
    }
}

int main(int argc, char** argv) {
  if (argc < 2) {
    std::fprintf(stderr, "usage: %s <out.mp4> [frames] [size] [fps]\n", argv[0]);
    return 2;
  }
  const char* path = argv[1];
  int frames = argc > 2 ? std::atoi(argv[2]) : 48;
  int size = argc > 3 ? std::atoi(argv[3]) : 128;
  int fps = argc > 4 ? std::atoi(argv[4]) : 8;

  AVFormatContext* oc = nullptr;
  if (avformat_alloc_output_context2(&oc, nullptr, nullptr, path) < 0 || !oc) {
    std::fprintf(stderr, "cannot allocate output context for %s\n", path);
    return 1;
  }
  const AVCodec* codec = avcodec_find_encoder(AV_CODEC_ID_MPEG4);
  if (!codec) codec = avcodec_find_encoder(AV_CODEC_ID_MJPEG);
  if (!codec) {
    std::fprintf(stderr, "no MPEG4/MJPEG encoder in this FFmpeg build\n");
    return 1;
  }
  AVStream* st = avformat_new_stream(oc, nullptr);
  AVCodecContext* cc = avcodec_alloc_context3(codec);
  cc->width = size;
  cc->height = size;
  cc->time_base = AVRational{1, fps};
  cc->framerate = AVRational{fps, 1};
  cc->pix_fmt = codec->id == AV_CODEC_ID_MJPEG ? AV_PIX_FMT_YUVJ420P
                                               : AV_PIX_FMT_YUV420P;
  cc->bit_rate = 200000;
  cc->gop_size = 12;
  if (oc->oformat->flags & AVFMT_GLOBALHEADER)
    cc->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
  if (avcodec_open2(cc, codec, nullptr) < 0) {
    std::fprintf(stderr, "encoder open failed\n");
    return 1;
  }
  avcodec_parameters_from_context(st->codecpar, cc);
  st->time_base = cc->time_base;
  if (!(oc->oformat->flags & AVFMT_NOFILE) &&
      avio_open(&oc->pb, path, AVIO_FLAG_WRITE) < 0) {
    std::fprintf(stderr, "cannot open %s\n", path);
    return 1;
  }
  if (avformat_write_header(oc, nullptr) < 0) {
    std::fprintf(stderr, "header write failed\n");
    return 1;
  }

  AVFrame* frame = av_frame_alloc();
  frame->format = cc->pix_fmt;
  frame->width = size;
  frame->height = size;
  av_frame_get_buffer(frame, 0);
  AVPacket* pkt = av_packet_alloc();

  auto drain = [&](AVCodecContext* c) {
    while (avcodec_receive_packet(c, pkt) == 0) {
      av_packet_rescale_ts(pkt, cc->time_base, st->time_base);
      pkt->stream_index = st->index;
      av_interleaved_write_frame(oc, pkt);
      av_packet_unref(pkt);
    }
  };

  for (int i = 0; i < frames; ++i) {
    av_frame_make_writable(frame);
    fill_frame(frame, i, size, size);
    frame->pts = i;
    if (avcodec_send_frame(cc, frame) < 0) {
      std::fprintf(stderr, "encode failed at frame %d\n", i);
      return 1;
    }
    drain(cc);
  }
  avcodec_send_frame(cc, nullptr);  // flush
  drain(cc);
  av_write_trailer(oc);

  av_packet_free(&pkt);
  av_frame_free(&frame);
  avcodec_free_context(&cc);
  if (!(oc->oformat->flags & AVFMT_NOFILE)) avio_closep(&oc->pb);
  avformat_free_context(oc);
  std::fprintf(stderr, "wrote %s (%d frames, %dx%d @ %d fps, %s)\n", path,
               frames, size, size, fps, codec->name);
  return 0;
}

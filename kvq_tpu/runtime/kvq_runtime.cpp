// kvq_tpu native host runtime.
//
// The reference delegates its hot host-side work to decord/FFmpeg and a
// Python triple loop (SURVEY.md §2.5): video decode, the fragment-mosaic
// gather, and normalization dominate per-sample CPU cost.  This library
// provides those as native, multithreaded primitives consumed from Python
// via ctypes (kvq_tpu/runtime/__init__.py):
//
//   kvq_open_video / kvq_video_frames / kvq_decode_frames / kvq_close_video
//       OpenCV(FFmpeg) sequential decode with unique-frame retention —
//       the decord-equivalent random access path.
//   kvq_fragment_mosaic
//       fused gather + (x - mean)/std normalization producing the
//       channels-last float32 mosaic directly (no intermediate copies).
//   kvq_resize_normalize
//       cv::resize (area/linear) + normalization for the resize views.
//
// Build: see kvq_tpu/runtime/build.sh (plain g++, links OpenCV).

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <functional>
#include <map>
#include <mutex>
#include <thread>
#include <vector>

#include <opencv2/core.hpp>
#include <opencv2/imgproc.hpp>
#include <opencv2/videoio.hpp>

namespace {

struct VideoHandle {
  std::string path;
  int n_frames_raw = 0;
  int pad_short = 0;  // pad-repeat to >pad_short frames when shorter
  // decord-parity sequential scan state: unrequested frames are grab()-ed
  // (bitstream decode only — no BGR2RGB conversion or copy), requested
  // frames are retrieved into the cache, and the scan early-stops at the
  // highest requested index (reference fusion_datasets.py:467-478
  // decodes only requested unique frames).
  cv::VideoCapture cap;
  bool cap_open = false;
  int pos = 0;  // next frame index the open capture would produce
  // Containers that report a sane frame count get keyframe seeks across
  // large request gaps (mirrors data/decode.py _SEEK_MIN_SKIP policy —
  // misreporting containers are the ones with untrustworthy POS_FRAMES).
  bool seek_ok = false;
  std::map<int, cv::Mat> cache;
  std::mutex mu;
};

// Seek instead of grab-scanning when it skips at least this many frames
// (a seek decodes forward from the previous keyframe, so the win must
// clear a typical GOP with margin).
constexpr int kSeekMinSkip = 64;

// Satisfy `want` (sorted unique frame indices) in h->cache, early-stopping
// at want.back().  Returns false when nothing could be decoded.
// Caller must hold h->mu (the cache keeps growing across calls, so readers
// need the same lock as this writer).
bool ensure_frames_locked(VideoHandle* h, const std::vector<int>& want_in) {
  std::vector<int> want;
  for (int i : want_in)
    if (!h->cache.count(i)) want.push_back(i);
  if (want.empty()) return !h->cache.empty() || want_in.empty();
  if (!h->cap_open || want.front() < h->pos) {
    if (h->cap_open) h->cap.release();
    h->cap.open(h->path);
    h->cap_open = h->cap.isOpened();
    h->pos = 0;
    if (!h->cap_open) return false;
  }
  int stop = want.back();
  size_t wi = 0;
  bool eof = false;
  bool seeked = false;
  cv::Mat frame;
  while (h->pos <= stop) {
    while (wi < want.size() && want[wi] < h->pos) ++wi;
    if (h->seek_ok && wi < want.size() && want[wi] - h->pos >= kSeekMinSkip) {
      h->cap.set(cv::CAP_PROP_POS_FRAMES, want[wi]);
      h->pos = want[wi];
      seeked = true;
    }
    bool needed = (wi < want.size() && want[wi] == h->pos);
    if (needed) {
      if (!h->cap.read(frame)) { eof = true; break; }
      cv::Mat rgb;
      cv::cvtColor(frame, rgb, cv::COLOR_BGR2RGB);
      h->cache.emplace(h->pos, std::move(rgb));
    } else if (!h->cap.grab()) {
      eof = true;
      break;
    }
    h->pos++;
  }
  if (eof && seeked) {
    // EOF after a seek: pos is the (never reached) seek target, not the
    // true container length — an overcounting header sent the seek past
    // EOF.  Disable seeking for this handle and redo the request as a
    // pure scan, whose EOF recovery below handles the clamp correctly
    // (mirrors data/decode.py).
    h->cap.release();
    h->cap_open = false;
    h->pos = 0;
    h->seek_ok = false;
    return ensure_frames_locked(h, want_in);
  }
  if (eof) {
    // container metadata overcounted: true length is pos.  Cache the real
    // last frame so out-of-range indices clamp to it.
    h->n_frames_raw = h->pos;
    int last = h->pos - 1;
    if (last >= 0 && !h->cache.count(last)) {
      h->cap.release();
      h->cap.open(h->path);
      for (int k = 0; k < last; ++k)
        if (!h->cap.grab()) break;
      if (h->cap.read(frame)) {
        cv::Mat rgb;
        cv::cvtColor(frame, rgb, cv::COLOR_BGR2RGB);
        h->cache.emplace(last, std::move(rgb));
      }
      h->pos = last + 1;
    }
  }
  return !h->cache.empty();
}

void parallel_for(int n, int n_threads, const std::function<void(int, int)>& fn) {
  if (n_threads <= 1 || n <= 1) {
    fn(0, n);
    return;
  }
  n_threads = std::min(n_threads, n);
  std::vector<std::thread> threads;
  int chunk = (n + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    int lo = t * chunk;
    int hi = std::min(n, lo + chunk);
    if (lo >= hi) break;
    threads.emplace_back([&fn, lo, hi] { fn(lo, hi); });
  }
  for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

void* kvq_open_video(const char* path, int pad_short) {
  cv::VideoCapture cap(path);
  if (!cap.isOpened()) return nullptr;
  auto* h = new VideoHandle;
  h->path = path;
  h->pad_short = pad_short;
  h->n_frames_raw = (int)cap.get(cv::CAP_PROP_FRAME_COUNT);
  h->seek_ok = h->n_frames_raw > 0;
  if (h->n_frames_raw <= 0) {
    // bad container metadata (VFR/webm/streams): count by a grab()-only
    // pass or the early-stop clamp would freeze the clip on frame 0
    int cnt = 0;
    while (cap.grab()) ++cnt;
    h->n_frames_raw = cnt;
  }
  cap.release();
  return h;
}

int kvq_video_frames(void* handle) {
  auto* h = (VideoHandle*)handle;
  if (!h) return -1;
  int n = h->n_frames_raw;
  if (h->pad_short > 0 && n > 0 && n <= h->pad_short) return h->pad_short + 1;
  return n;
}

double kvq_video_fps(const char* path) {
  cv::VideoCapture cap(path);
  if (!cap.isOpened()) return 0.0;
  double fps = cap.get(cv::CAP_PROP_FPS);
  cap.release();
  return fps;
}

// Decode the given frame indices as RGB uint8 into out (n, H, W, 3).
// Returns the frame height<<16|width on success (all frames same size),
// -1 on failure.  Indices are clamped to the decoded range.
int64_t kvq_decode_frames(void* handle, const int32_t* indices, int n,
                          uint8_t* out) {
  auto* h = (VideoHandle*)handle;
  if (!h) return -1;
  // One lock spans clamp + decode + copy: the cache grows on every call,
  // so concurrent kvq_decode_frames on a shared handle would otherwise
  // race a reader against ensure_frames_locked's std::map inserts.
  std::lock_guard<std::mutex> lock(h->mu);
  // clamp to metadata range, gather unique sorted wanted indices
  std::vector<int> want;
  want.reserve(n);
  int hi_meta = h->n_frames_raw > 0 ? h->n_frames_raw - 1 : 0;
  for (int i = 0; i < n; ++i) {
    int idx = indices[i];
    if (idx < 0) idx = 0;
    if (idx > hi_meta) idx = hi_meta;
    want.push_back(idx);
  }
  std::vector<int> uniq(want);
  std::sort(uniq.begin(), uniq.end());
  uniq.erase(std::unique(uniq.begin(), uniq.end()), uniq.end());
  // n == 0 is the bindings' dimension probe: decode just frame 0
  if (uniq.empty()) uniq.push_back(0);
  if (!ensure_frames_locked(h, uniq) || h->cache.empty()) return -1;
  int hi_cached = h->cache.rbegin()->first;
  const cv::Mat& first = h->cache.begin()->second;
  int H = first.rows, W = first.cols;
  size_t frame_bytes = (size_t)H * W * 3;
  for (int i = 0; i < n; ++i) {
    int idx = std::min(want[i], hi_cached);
    auto it = h->cache.find(idx);
    if (it == h->cache.end()) return -1;
    std::memcpy(out + (size_t)i * frame_bytes, it->second.data, frame_bytes);
  }
  return ((int64_t)H << 16) | (int64_t)W;
}

void kvq_close_video(void* handle) {
  auto* h = (VideoHandle*)handle;
  if (h && h->cap_open) h->cap.release();
  delete h;
}

// Fused fragment mosaic + normalize.
//   video:  (T, H, W, 3) uint8
//   ymap/xmap: (tgroups, out_h, out_w) int32 gather maps
//     (kvq_tpu.data.fragments.fragment_index_maps)
//   out: (T, out_h, out_w, 3) float32, value = (v - mean[c]) / stdv[c]
void kvq_fragment_mosaic(const uint8_t* video, int T, int H, int W,
                         const int32_t* ymap, const int32_t* xmap,
                         int tgroups, int aligned, int out_h, int out_w,
                         const float* mean, const float* stdv, float* out,
                         int n_threads) {
  float inv_std[3] = {1.f / stdv[0], 1.f / stdv[1], 1.f / stdv[2]};
  parallel_for(T, n_threads, [&](int lo, int hi) {
    for (int t = lo; t < hi; ++t) {
      int tg = t / aligned;
      if (tg >= tgroups) tg = tgroups - 1;
      const int32_t* ym = ymap + (size_t)tg * out_h * out_w;
      const int32_t* xm = xmap + (size_t)tg * out_h * out_w;
      const uint8_t* src = video + (size_t)t * H * W * 3;
      float* dst = out + (size_t)t * out_h * out_w * 3;
      for (int oy = 0; oy < out_h; ++oy) {
        for (int ox = 0; ox < out_w; ++ox) {
          size_t o = ((size_t)oy * out_w + ox);
          const uint8_t* px = src + ((size_t)ym[o] * W + xm[o]) * 3;
          float* dp = dst + o * 3;
          dp[0] = ((float)px[0] - mean[0]) * inv_std[0];
          dp[1] = ((float)px[1] - mean[1]) * inv_std[1];
          dp[2] = ((float)px[2] - mean[2]) * inv_std[2];
        }
      }
    }
  });
}

// Resize each frame (area when downscaling, linear otherwise — matching
// kvq_tpu.data.views._resize_frame) + normalize.
//   div255: divide by 255 before mean/std (the CLIP profile)
void kvq_resize_normalize(const uint8_t* video, int T, int H, int W, int oh,
                          int ow, const float* mean, const float* stdv,
                          int div255, float* out, int n_threads) {
  float inv_std[3] = {1.f / stdv[0], 1.f / stdv[1], 1.f / stdv[2]};
  float scale = div255 ? 1.f / 255.f : 1.f;
  int interp = (oh < H || ow < W) ? cv::INTER_AREA : cv::INTER_LINEAR;
  parallel_for(T, n_threads, [&](int lo, int hi) {
    for (int t = lo; t < hi; ++t) {
      cv::Mat src(H, W, CV_8UC3, (void*)(video + (size_t)t * H * W * 3));
      cv::Mat resized;
      cv::resize(src, resized, cv::Size(ow, oh), 0, 0, interp);
      float* dst = out + (size_t)t * oh * ow * 3;
      for (int y = 0; y < oh; ++y) {
        const uint8_t* row = resized.ptr<uint8_t>(y);
        for (int x = 0; x < ow; ++x) {
          size_t o = ((size_t)y * ow + x) * 3;
          dst[o + 0] = ((float)row[x * 3 + 0] * scale - mean[0]) * inv_std[0];
          dst[o + 1] = ((float)row[x * 3 + 1] * scale - mean[1]) * inv_std[1];
          dst[o + 2] = ((float)row[x * 3 + 2] * scale - mean[2]) * inv_std[2];
        }
      }
    }
  });
}

}  // extern "C"

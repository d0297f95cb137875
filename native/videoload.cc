// Native frame decoder for the ROVR-TPU input pipeline.
//
// The reference's only native dependency is OpenCV via python cv2
// (reference: rovr/video_ds.py:108-113 — imread, BGR->RGB, resize to
// 1024x512, split into halves, resize the half to the frame size). Here that
// decode-resize-split-resize hot path is C++: it holds no Python state,
// releases the GIL (called via ctypes), and `rovr_decode_clip` fans a whole
// clip out over std::thread workers so one dataloader thread saturates
// many cores.
//
// Exposed C ABI (bound in rovr_tpu/data/native_loader.py):
//   rovr_decode_half(path, out_h, out_w, half, out_rgb)     -> 0 on success
//   rovr_decode_clip(paths, n, out_h, out_w, half, threads, out_rgb)
//   rovr_corrupt_frame(...)  — deterministic box-mask corruption on uint8

#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

#include <opencv2/imgcodecs.hpp>
#include <opencv2/imgproc.hpp>

namespace {

// Decode one image file and produce the (out_h, out_w, 3) RGB half-frame.
// Mirrors video_ds.py:107-113: resize to 1024x512, split width-wise, resize.
int decode_half_impl(const char* path, int out_h, int out_w, int half,
                     uint8_t* out) {
  cv::Mat bgr = cv::imread(path, cv::IMREAD_COLOR);
  if (bgr.empty()) return 1;
  cv::Mat rgb;
  cv::cvtColor(bgr, rgb, cv::COLOR_BGR2RGB);
  cv::Mat resized;
  cv::resize(rgb, resized, cv::Size(1024, 512), 0, 0, cv::INTER_LINEAR);
  cv::Mat half_mat = resized(cv::Rect(half == 0 ? 0 : 512, 0, 512, 512));
  cv::Mat out_mat(out_h, out_w, CV_8UC3, out);
  cv::resize(half_mat, out_mat, cv::Size(out_w, out_h), 0, 0,
             cv::INTER_LINEAR);
  // cv::resize may reallocate if types mismatch; guarantee the copy landed.
  if (out_mat.data != out) {
    std::memcpy(out, out_mat.data,
                static_cast<size_t>(out_h) * out_w * 3);
  }
  return 0;
}

}  // namespace

extern "C" {

int rovr_decode_half(const char* path, int out_h, int out_w, int half,
                     uint8_t* out) {
  return decode_half_impl(path, out_h, out_w, half, out);
}

// Decode n frames in parallel into out (n, out_h, out_w, 3) row-major.
int rovr_decode_clip(const char** paths, int n, int out_h, int out_w,
                     int half, int threads, uint8_t* out) {
  if (threads < 1) threads = 1;
  const size_t stride = static_cast<size_t>(out_h) * out_w * 3;
  std::atomic<int> next{0};
  std::atomic<int> failed{0};
  auto worker = [&]() {
    for (int i = next.fetch_add(1); i < n; i = next.fetch_add(1)) {
      if (decode_half_impl(paths[i], out_h, out_w, half, out + i * stride)) {
        failed.store(1);
      }
    }
  };
  std::vector<std::thread> pool;
  const int nthreads = threads > n ? n : threads;
  pool.reserve(nthreads);
  for (int t = 0; t < nthreads; ++t) pool.emplace_back(worker);
  for (auto& t : pool) t.join();
  return failed.load();
}

// Deterministic raster box mask (video_ds.py:62-87 semantics): a box of
// (box_h, box_w) whose top-left tracks frame_index over a virtual grid of
// positions, clipped to the frame. Writes the corrupted frame in place and
// the {0,1} mask into mask_out (h, w, 3).
int rovr_apply_box_mask(uint8_t* frame, uint8_t* mask_out, int h, int w,
                        int frame_index, int box_h, int box_w) {
  const int cols = w / box_w > 0 ? w / box_w : 1;
  const int row = (frame_index / cols) % ((h / box_h > 0 ? h / box_h : 1));
  const int col = frame_index % cols;
  const int y0 = row * box_h, x0 = col * box_w;
  const int y1 = y0 + box_h > h ? h : y0 + box_h;
  const int x1 = x0 + box_w > w ? w : x0 + box_w;
  std::memset(mask_out, 0, static_cast<size_t>(h) * w * 3);
  for (int y = y0; y < y1; ++y) {
    uint8_t* frow = frame + (static_cast<size_t>(y) * w + x0) * 3;
    uint8_t* mrow = mask_out + (static_cast<size_t>(y) * w + x0) * 3;
    const size_t len = static_cast<size_t>(x1 - x0) * 3;
    std::memset(frow, 0, len);
    std::memset(mrow, 1, len);
  }
  return 0;
}

}  // extern "C"

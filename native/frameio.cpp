// Native async frame pipeline: double-buffered producer/consumer queue
// with a background encoder thread writing PNG/PPM frames to disk.
//
// TPU-native analog of the reference visualizer's concurrency core
// (/root/reference/src/visualization/renderer.cpp:863-1006): there, a
// physics thread fills a mutex+condvar-guarded double-buffered
// RenderData consumed by the render thread.  Here the roles flip — the
// device (TPU) produces frames and this native thread consumes them, so
// Python never blocks on image encoding/disk IO between device
// dispatches.  PNG encoding is done natively (zlib) for throughput.
//
// C ABI (used from Python via ctypes — see blackhole_tpu/viz/native_io.py):
//   void* fio_create(int width, int height, int queue_capacity);
//   int   fio_submit(void* h, const unsigned char* rgb, const char* path);
//   int   fio_pending(void* h);
//   void  fio_flush(void* h);
//   int   fio_frames_written(void* h);
//   void  fio_destroy(void* h);
//
// Build: g++ -O2 -shared -fPIC -o libframeio.so frameio.cpp -lz -pthread

#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include <zlib.h>

namespace {

struct Frame {
  std::vector<unsigned char> rgb;  // H*W*3
  std::string path;
};

// --- minimal PNG encoder (RGB8, filter 0, one IDAT) ---

void put_be32(std::vector<unsigned char>& out, uint32_t v) {
  out.push_back((v >> 24) & 0xFF);
  out.push_back((v >> 16) & 0xFF);
  out.push_back((v >> 8) & 0xFF);
  out.push_back(v & 0xFF);
}

void put_chunk(std::vector<unsigned char>& out, const char tag[4],
               const unsigned char* data, size_t len) {
  put_be32(out, static_cast<uint32_t>(len));
  size_t start = out.size();
  out.insert(out.end(), tag, tag + 4);
  out.insert(out.end(), data, data + len);
  uint32_t crc = crc32(0L, Z_NULL, 0);
  crc = crc32(crc, out.data() + start, static_cast<uInt>(4 + len));
  put_be32(out, crc);
}

bool write_png(const std::string& path, const unsigned char* rgb, int w,
               int h) {
  // Raw scanlines with filter byte 0.
  std::vector<unsigned char> raw(static_cast<size_t>(h) * (1 + 3 * w));
  for (int y = 0; y < h; ++y) {
    raw[static_cast<size_t>(y) * (1 + 3 * w)] = 0;
    std::memcpy(&raw[static_cast<size_t>(y) * (1 + 3 * w) + 1],
                rgb + static_cast<size_t>(y) * 3 * w, 3 * w);
  }
  uLongf comp_cap = compressBound(static_cast<uLong>(raw.size()));
  std::vector<unsigned char> comp(comp_cap);
  if (compress2(comp.data(), &comp_cap, raw.data(),
                static_cast<uLong>(raw.size()), 6) != Z_OK) {
    return false;
  }

  std::vector<unsigned char> out;
  static const unsigned char sig[8] = {0x89, 'P', 'N', 'G',
                                       '\r', '\n', 0x1A, '\n'};
  out.insert(out.end(), sig, sig + 8);
  unsigned char ihdr[13];
  ihdr[0] = (w >> 24) & 0xFF; ihdr[1] = (w >> 16) & 0xFF;
  ihdr[2] = (w >> 8) & 0xFF;  ihdr[3] = w & 0xFF;
  ihdr[4] = (h >> 24) & 0xFF; ihdr[5] = (h >> 16) & 0xFF;
  ihdr[6] = (h >> 8) & 0xFF;  ihdr[7] = h & 0xFF;
  ihdr[8] = 8;   // bit depth
  ihdr[9] = 2;   // color type RGB
  ihdr[10] = 0; ihdr[11] = 0; ihdr[12] = 0;
  put_chunk(out, "IHDR", ihdr, 13);
  put_chunk(out, "IDAT", comp.data(), comp_cap);
  put_chunk(out, "IEND", nullptr, 0);

  FILE* f = std::fopen(path.c_str(), "wb");
  if (!f) return false;
  size_t n = std::fwrite(out.data(), 1, out.size(), f);
  std::fclose(f);
  return n == out.size();
}

bool write_ppm(const std::string& path, const unsigned char* rgb, int w,
               int h) {
  FILE* f = std::fopen(path.c_str(), "wb");
  if (!f) return false;
  std::fprintf(f, "P6\n%d %d\n255\n", w, h);
  size_t n = std::fwrite(rgb, 1, static_cast<size_t>(w) * h * 3, f);
  std::fclose(f);
  return n == static_cast<size_t>(w) * h * 3;
}

struct FrameWriter {
  int width, height, capacity;
  std::deque<Frame> queue;
  std::mutex mu;
  std::condition_variable cv_submit;  // producer waits when full
  std::condition_variable cv_drain;   // consumer waits when empty
  std::thread worker;
  bool running = true;
  bool in_flight = false;
  int written = 0;
  int errors = 0;

  FrameWriter(int w, int h, int cap)
      : width(w), height(h), capacity(cap) {
    worker = std::thread([this] { run(); });
  }

  ~FrameWriter() {
    {
      std::unique_lock<std::mutex> lk(mu);
      running = false;
      cv_drain.notify_all();
    }
    worker.join();
  }

  // Blocks when the queue is full (bounded back-pressure, like the
  // reference's buffer swap waiting on the render thread).
  bool submit(const unsigned char* rgb, const char* path) {
    std::unique_lock<std::mutex> lk(mu);
    cv_submit.wait(lk, [this] {
      return static_cast<int>(queue.size()) < capacity || !running;
    });
    if (!running) return false;
    Frame fr;
    fr.rgb.assign(rgb, rgb + static_cast<size_t>(width) * height * 3);
    fr.path = path;
    queue.push_back(std::move(fr));
    cv_drain.notify_one();
    return true;
  }

  // Waits until every submitted frame is fully on disk (queue empty
  // AND no frame mid-encode).
  void flush() {
    std::unique_lock<std::mutex> lk(mu);
    cv_submit.wait(lk, [this] {
      return (queue.empty() && !in_flight) || !running;
    });
  }

  int pending() {
    std::unique_lock<std::mutex> lk(mu);
    return static_cast<int>(queue.size());
  }

  void run() {
    for (;;) {
      Frame fr;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_drain.wait(lk, [this] { return !queue.empty() || !running; });
        if (queue.empty()) {
          if (!running) return;
          continue;
        }
        fr = std::move(queue.front());
        queue.pop_front();
        in_flight = true;
      }
      bool ok;
      if (fr.path.size() >= 4 &&
          fr.path.compare(fr.path.size() - 4, 4, ".ppm") == 0) {
        ok = write_ppm(fr.path, fr.rgb.data(), width, height);
      } else {
        ok = write_png(fr.path, fr.rgb.data(), width, height);
      }
      {
        std::unique_lock<std::mutex> lk(mu);
        if (ok) ++written; else ++errors;
        in_flight = false;
        cv_submit.notify_all();
      }
    }
  }
};

}  // namespace

extern "C" {

void* fio_create(int width, int height, int queue_capacity) {
  if (width <= 0 || height <= 0 || queue_capacity <= 0) return nullptr;
  return new FrameWriter(width, height, queue_capacity);
}

int fio_submit(void* h, const unsigned char* rgb, const char* path) {
  if (!h || !rgb || !path) return -1;
  return static_cast<FrameWriter*>(h)->submit(rgb, path) ? 0 : -2;
}

int fio_pending(void* h) {
  return h ? static_cast<FrameWriter*>(h)->pending() : -1;
}

void fio_flush(void* h) {
  if (h) static_cast<FrameWriter*>(h)->flush();
}

int fio_frames_written(void* h) {
  return h ? static_cast<FrameWriter*>(h)->written : -1;
}

int fio_errors(void* h) {
  return h ? static_cast<FrameWriter*>(h)->errors : -1;
}

void fio_destroy(void* h) {
  delete static_cast<FrameWriter*>(h);
}

}  // extern "C"

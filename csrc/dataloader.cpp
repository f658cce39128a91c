// Native data loader for cnn_tpu — the TPU-framework equivalent of the
// reference's C++ data path (pipeline.cpp:112-164), rebuilt as a
// multithreaded batch engine behind a C ABI (ctypes-friendly; no pybind11).
//
// Decode (cv::imread) + bilinear resize happen here in C++, releasing the
// Python GIL for the whole batch; the uint8 BGR HWC output feeds the
// device-side normalize kernel (cnn_tpu/ops/preprocess.py). Unlike the
// reference there is no per-scalar float conversion on the host at all.

#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

#include <opencv2/core.hpp>
#include <opencv2/imgcodecs.hpp>
#include <opencv2/imgproc.hpp>

extern "C" {

// Decode one image file and bilinear-resize to size x size x 3 (BGR uint8).
// Returns 0 on success, nonzero on failure. `out` must hold size*size*3.
int cnn_decode_resize(const char* path, int size, uint8_t* out) {
    cv::Mat img = cv::imread(path, cv::IMREAD_COLOR);
    if (img.empty()) return 1;
    cv::Mat resized;
    cv::resize(img, resized, cv::Size(size, size));  // bilinear, like pipeline.cpp:159
    if (!resized.isContinuous()) resized = resized.clone();
    std::memcpy(out, resized.data, static_cast<size_t>(size) * size * 3);
    return 0;
}

// Decode+resize a whole batch with a thread pool. `out` holds n*size*size*3.
// Returns the number of failed images (0 == all good).
int cnn_load_batch(const char** paths, int n, int size, int num_threads,
                   uint8_t* out) {
    if (num_threads < 1) num_threads = 1;
    std::atomic<int> next(0), failures(0);
    const size_t stride = static_cast<size_t>(size) * size * 3;
    auto worker = [&]() {
        for (;;) {
            const int i = next.fetch_add(1);
            if (i >= n) break;
            if (cnn_decode_resize(paths[i], size, out + stride * i) != 0)
                failures.fetch_add(1);
        }
    };
    std::vector<std::thread> threads;
    const int k = std::min(num_threads, n);
    threads.reserve(k);
    for (int t = 0; t < k; ++t) threads.emplace_back(worker);
    for (auto& th : threads) th.join();
    return failures.load();
}

}  // extern "C"

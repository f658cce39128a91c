// Baseline benchmark: measures the UNMODIFIED reference framework's training
// throughput (images/sec) and single-image inference latency on this CPU.
// The reference publishes no perf numbers (BASELINE.md), so this establishes
// the >=100x north-star denominator. Train loop mirrors cnn.cpp:77-96
// (forward -> softmax -> CE -> backward -> SGD) on a fixed in-memory batch
// so disk IO is excluded (we measure compute, the favorable case for it).

#include <chrono>
#include <cstdio>
#include <random>
#include <vector>

#include "architectures.h"
#include "func.h"

using clk = std::chrono::steady_clock;

int main(int argc, char** argv) {
    const int batch_size = argc > 1 ? std::atoi(argv[1]) : 4;
    const int iters = argc > 2 ? std::atoi(argv[2]) : 20;

    using namespace architectures;
    AlexNet network(3, false);

    // synthetic batch, fixed content
    std::mt19937 gen(212);
    std::uniform_real_distribution<float> dist(0.f, 1.f);
    std::vector<tensor> batch;
    std::vector<int> labels;
    for (int b = 0; b < batch_size; ++b) {
        tensor t(new Tensor3D(3, 224, 224, "bench"));
        for (int i = 0; i < 3 * 224 * 224; ++i) t->data[i] = dist(gen);
        batch.push_back(t);
        labels.push_back(b % 3);
    }

    // warmup (allocates the lazy buffers)
    {
        const auto out = network.forward(batch);
        const auto probs = softmax(out);
        auto ld = cross_entroy_backward(probs, one_hot(labels, 3));
        network.backward(ld.second);
        network.update_gradients(1e-3f);
    }

    auto t0 = clk::now();
    for (int it = 0; it < iters; ++it) {
        const auto out = network.forward(batch);
        const auto probs = softmax(out);
        auto ld = cross_entroy_backward(probs, one_hot(labels, 3));
        network.backward(ld.second);
        network.update_gradients(1e-3f);
    }
    double train_s = std::chrono::duration<double>(clk::now() - t0).count();
    double imgs_per_sec = batch_size * iters / train_s;

    // inference latency, batch size 1 (mirrors inference.cpp:50-69)
    std::vector<tensor> one(batch.begin(), batch.begin() + 1);
    {
        WithoutGrad guard;
        network.forward(one);  // warmup eval path
        const int n = 30;
        auto t1 = clk::now();
        for (int i = 0; i < n; ++i) {
            const auto out = network.forward(one);
            softmax(out);
        }
        double infer_s = std::chrono::duration<double>(clk::now() - t1).count();
        std::printf("{\"train_images_per_sec\": %.4f, \"train_step_ms\": %.2f, "
                    "\"batch_size\": %d, \"infer_p50_ms\": %.2f}\n",
                    imgs_per_sec, 1000.0 * train_s / iters, batch_size,
                    1000.0 * infer_s / n);
    }
    return 0;
}

// BN train-vs-eval gap oracle: measure the reference's ACTUAL BatchNorm
// eval pathology (README.md:15 "BN 验证时性能很差") instead of guessing its
// cause. Trains AlexNet(batch_norm=true) on a fixed in-memory subset for N
// iters (bs=4, the reference's training shape), then reports top-1 accuracy
// over the SAME images in (a) train mode (batch statistics,
// batchnorm2d.cpp:44-80) and (b) eval mode (moving statistics, :81-94).
// A large (a)-(b) gap on identical data isolates the BN-statistics problem
// from ordinary generalization gap.
//
// This file is OURS; it links the unmodified reference translation units.
//
// usage: bn_gap <dataset_dir> <iters> [n_per_class=24] [lr=1e-3]

#include <cstdio>
#include <cstdlib>
#include <filesystem>
#include <string>
#include <vector>

#include <opencv2/imgcodecs.hpp>
#include <opencv2/imgproc.hpp>

#include "architectures.h"
#include "func.h"

using namespace architectures;
namespace fs = std::filesystem;

static const char* kCategories[3] = {"dog", "panda", "bird"};

int main(int argc, char** argv) {
    if (argc < 3) {
        std::printf("usage: bn_gap <dataset_dir> <iters> [n_per_class] [lr]\n");
        return 1;
    }
    const std::string root = argv[1];
    const int iters = std::atoi(argv[2]);
    const int per_class = argc > 3 ? std::atoi(argv[3]) : 24;
    const float lr = argc > 4 ? std::atof(argv[4]) : 1e-3f;

    // fixed in-memory set (decode once; deterministic directory order)
    std::vector<tensor> images;
    std::vector<int> labels;
    for (int c = 0; c < 3; ++c) {
        std::vector<std::string> files;
        for (const auto& e : fs::directory_iterator(root + "/" + kCategories[c]))
            files.emplace_back(e.path().string());
        std::sort(files.begin(), files.end());
        int kept = 0;
        for (const auto& f : files) {
            if (kept >= per_class) break;
            cv::Mat img = cv::imread(f);
            if (img.empty()) continue;
            cv::resize(img, img, {224, 224});
            tensor t(new Tensor3D(3, 224, 224, "img"));
            t->read_from_opencv_mat(img.data);
            images.emplace_back(t);
            labels.emplace_back(c);
            ++kept;
        }
    }
    const int n = static_cast<int>(images.size());
    std::printf("loaded %d images\n", n);

    AlexNet net(3, /*batch_norm=*/true);
    const int bs = 4;

    // train loop: cycle the fixed set in order (cnn.cpp:77-96 loop body)
    for (int it = 0; it < iters; ++it) {
        std::vector<tensor> batch;
        std::vector<int> y;
        for (int b = 0; b < bs; ++b) {
            const int i = (it * bs + b) % n;
            batch.emplace_back(images[i]);
            y.emplace_back(labels[i]);
        }
        architectures::no_grad = false;
        const auto out = net.forward(batch);
        const auto probs = softmax(out);
        auto ld = cross_entroy_backward(probs, one_hot(y, 3));
        net.backward(ld.second);
        net.update_gradients(lr);
        if ((it + 1) % 100 == 0)
            std::printf("iter %d loss %.4f\n", it + 1, ld.first);
    }

    // accuracy over the SAME images, train mode vs eval mode
    auto accuracy = [&](bool eval_mode) {
        int correct = 0;
        for (int start = 0; start + bs <= n; start += bs) {
            std::vector<tensor> batch(images.begin() + start,
                                      images.begin() + start + bs);
            architectures::no_grad = eval_mode;
            // train-mode measurement must not update moving stats further:
            // acceptable for the oracle — we measure eval AFTER train-mode
            // (stats shift is momentum-bounded and reported)
            const auto out = net.forward(batch);
            const auto probs = softmax(out);
            for (int b = 0; b < bs; ++b)
                if (probs[b]->argmax() == labels[start + b]) ++correct;
        }
        return static_cast<float>(correct) / static_cast<float>((n / bs) * bs);
    };

    const float eval_acc = accuracy(true);    // eval first: freezes stats
    const float train_acc = accuracy(false);
    std::printf("RESULT train_mode_acc %.4f eval_mode_acc %.4f gap %.4f\n",
                train_acc, eval_acc, train_acc - eval_acc);
    return 0;
}

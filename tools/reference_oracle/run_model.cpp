// Closed-loop interop runner: the UNMODIFIED reference framework executes an
// ARBITRARY .model checkpoint — in particular one EXPORTED by cnn_tpu
// (utils/checkpoint.py:export_reference_model) — and dumps what it computed,
// so a pytest can assert that the C++ reference itself accepts and
// reproduces our weights (VERDICT r2 item 3; load path alexnet.cpp:80-90,
// the direction no fixture covered before).
//
// usage: run_model <checkpoint.model> <out_dir> <bn:0|1> <train:0|1> <img...>
// dumps per image: input_<i>.f32 (CHW, post read_from_opencv_mat),
//                  logits_<i>.f32 (3 floats), and a manifest.txt.
//
// train=0 runs the eval path (WithoutGrad — BN uses moving stats,
// batchnorm2d.cpp:81-94, matching cnn_tpu's train=False); train=1 mirrors
// fixture_gen (grads on, inference.cpp-style loop without the guard).
//
// This file is OURS (new code); it links the reference's translation units
// the same way its own mains do (reference build: cpu/CMakeLists.txt:42-55).

#include <cstdio>
#include <fstream>
#include <memory>
#include <string>
#include <vector>

#include <opencv2/core.hpp>
#include <opencv2/imgproc.hpp>
#include <opencv2/imgcodecs.hpp>

#include "architectures.h"
#include "func.h"

static void dump(const std::string& path, const float* data, size_t n) {
    std::ofstream f(path, std::ios::binary);
    f.write(reinterpret_cast<const char*>(data), n * sizeof(float));
}

int main(int argc, char** argv) {
    if (argc < 6) {
        std::printf("usage: run_model <ckpt.model> <out_dir> <bn:0|1> "
                    "<train:0|1> <img1> [img2 ...]\n");
        return 1;
    }
    const std::string ckpt = argv[1];
    const std::string out_dir = argv[2];
    const bool use_bn = std::stoi(argv[3]) != 0;
    const bool train_mode = std::stoi(argv[4]) != 0;

    using namespace architectures;
    AlexNet network(3, use_bn);
    network.load_weights(ckpt);
    architectures::no_grad = !train_mode;

    tensor buffer(new Tensor3D(3, 224, 224, "buf"));
    std::vector<tensor> batch({buffer});

    std::ofstream manifest(out_dir + "/manifest.txt");
    int n_out = 0;
    for (int i = 5; i < argc; ++i) {
        cv::Mat img = cv::imread(argv[i]);
        if (img.empty()) {
            std::printf("skip unreadable %s\n", argv[i]);
            continue;
        }
        cv::resize(img, img, {224, 224});
        buffer->read_from_opencv_mat(img.data);
        const auto output = network.forward(batch);
        const std::string stem = std::to_string(n_out++);
        dump(out_dir + "/input_" + stem + ".f32", buffer->data, 3 * 224 * 224);
        dump(out_dir + "/logits_" + stem + ".f32", output[0]->data, 3);
        manifest << stem << " " << argv[i] << "\n";
    }
    std::printf("ran %d images through %s (bn=%d train=%d)\n",
                n_out, ckpt.c_str(), use_bn ? 1 : 0, train_mode ? 1 : 0);
    return 0;
}

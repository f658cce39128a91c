// Gradient-parity oracle: run ONE reference train step (forward -> softmax
// -> cross-entropy delta -> backward -> SGD) on a fixed image batch and dump
// everything needed to verify jax.grad + optim.sgd reproduces the
// hand-written backward passes (conv2d.cpp:97-217, linear.cpp:47-102,
// batchnorm2d.cpp:100-166, pool2d.cpp:92-109, relu.cpp:30-44).
//
// Gradients are private members of the reference layers, so they are
// recovered through the PUBLIC api only: save_weights before the update and
// after update_gradients(lr=1.0) -- since the update is w -= lr*dw
// (conv2d.cpp:205-217), dW == before - after exactly (up to one f32
// rounding of the subtraction, ~1e-8 at these magnitudes). A second fresh
// network runs the identical step at the real lr=1e-3 for post-SGD parity.
//
// This file is OURS (new code); it links the unmodified reference
// translation units exactly like fixture_gen.cpp does.
//
// usage: grad_dump <ckpt.model|init> <bn:0|1> <out_dir> <img:label> ...

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <string>
#include <vector>

#include <opencv2/imgcodecs.hpp>
#include <opencv2/imgproc.hpp>

#include "architectures.h"
#include "func.h"

using namespace architectures;

static void dump(const std::string& path, const float* data, size_t n) {
    std::ofstream f(path, std::ios::binary);
    f.write(reinterpret_cast<const char*>(data),
            static_cast<std::streamsize>(n * sizeof(float)));
}

// one train step, mirroring the loop body of cnn.cpp:77-96; optionally
// dumps the pre-update logits (exactly one forward per step -- a second
// forward would double-update BN moving stats)
static float train_step(AlexNet& net, const std::vector<tensor>& batch,
                        const std::vector<int>& labels, float lr,
                        const std::string& logits_path = "") {
    architectures::no_grad = false;
    const auto output = net.forward(batch);
    if (!logits_path.empty()) {
        std::vector<float> flat;
        for (const auto& t : output)
            for (int c = 0; c < t->get_length(); ++c) flat.push_back(t->data[c]);
        dump(logits_path, flat.data(), flat.size());
    }
    const auto probs = softmax(output);
    auto loss_delta = cross_entroy_backward(
        probs, one_hot(labels, /*num_classes=*/3));
    net.backward(loss_delta.second);
    net.update_gradients(lr);
    return loss_delta.first;
}

int main(int argc, char** argv) {
    if (argc < 5) {
        std::printf("usage: grad_dump <ckpt.model|init> <bn:0|1> <out_dir> "
                    "<img:label> ...\n");
        return 1;
    }
    const std::string ckpt = argv[1];
    const bool bn = std::atoi(argv[2]) != 0;
    const std::string out = argv[3];

    // fixed batch: reference preprocessing (imread BGR -> resize 224
    // bilinear -> /255 CHW, pipeline.cpp:143-163 + data_format.cpp:13-23)
    std::vector<tensor> batch;
    std::vector<int> labels;
    std::ofstream manifest(out + "/manifest.txt");
    for (int i = 4; i < argc; ++i) {
        std::string arg(argv[i]);
        const auto colon = arg.rfind(':');
        const std::string path = arg.substr(0, colon);
        const int label = std::atoi(arg.substr(colon + 1).c_str());
        cv::Mat img = cv::imread(path);
        if (img.empty()) { std::printf("unreadable %s\n", path.c_str()); return 1; }
        cv::resize(img, img, {224, 224});
        tensor buf(new Tensor3D(3, 224, 224, "in"));
        buf->read_from_opencv_mat(img.data);
        batch.emplace_back(buf);
        labels.emplace_back(label);
        dump(out + "/input_" + std::to_string(i - 4) + ".f32",
             buf->data, 3 * 224 * 224);
        manifest << (i - 4) << " " << path << " " << label << "\n";
    }

    // network #1: dW recovery at lr=1.0
    AlexNet net1(3, bn);
    if (ckpt != "init") net1.load_weights(ckpt);
    net1.save_weights(out + "/before.model");
    const float loss1 = train_step(net1, batch, labels, 1.0f,
                                   out + "/logits.f32");
    net1.save_weights(out + "/after_lr1.model");

    // network #2: identical step at the reference's lr (cnn.cpp:69)
    AlexNet net2(3, bn);
    net2.load_weights(out + "/before.model");
    const float loss2 = train_step(net2, batch, labels, 1e-3f);
    net2.save_weights(out + "/after_sgd.model");

    dump(out + "/loss.f32", &loss1, 1);
    std::printf("loss lr1=%.8f lr1e-3=%.8f (must match)\n", loss1, loss2);
    std::printf("dumped before/after_lr1/after_sgd to %s\n", out.c_str());
    return loss1 == loss2 ? 0 : 2;
}

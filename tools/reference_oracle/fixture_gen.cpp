// Fixture generator: runs the UNMODIFIED reference framework (compiled from
// /root/reference sources, read-only) and dumps numerical oracles for the
// JAX parity tests:
//   - preprocessed input tensors (CHW f32, exactly what the net consumes)
//   - output logits per image
//   - the conv_layer_3 feature map + the grad-CAM heatmap (pre-colormap)
// Output: raw little-endian f32 blobs + a manifest, converted to .npz by
// tools/reference_oracle/make_fixtures.py.
//
// This file is OURS (new code); it links the reference's translation units
// the same way its own mains do (reference build: cpu/CMakeLists.txt:42-55).

#include <cstdio>
#include <cstring>
#include <fstream>
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
    if (argc < 4) {
        std::printf("usage: fixture_gen <checkpoint.model> <out_dir> <img1> [img2 ...]\n");
        return 1;
    }
    const std::string ckpt = argv[1];
    const std::string out_dir = argv[2];

    using namespace architectures;
    AlexNet network(3, false);
    network.load_weights(ckpt);

    tensor buffer(new Tensor3D(3, 224, 224, "buf"));
    std::vector<tensor> batch({buffer});

    std::ofstream manifest(out_dir + "/manifest.txt");
    for (int i = 3; i < argc; ++i) {
        cv::Mat img = cv::imread(argv[i]);
        if (img.empty()) { std::printf("skip unreadable %s\n", argv[i]); continue; }
        cv::resize(img, img, {224, 224});
        buffer->read_from_opencv_mat(img.data);

        // grads ON so grad_cam works (mirrors grad_cam.cpp:57)
        architectures::no_grad = false;
        const auto output = network.forward(batch);
        const auto probs = softmax(output);

        std::string stem = std::to_string(i - 3);
        dump(out_dir + "/input_" + stem + ".f32", buffer->data, 3 * 224 * 224);
        dump(out_dir + "/logits_" + stem + ".f32", output[0]->data, 3);
        dump(out_dir + "/probs_" + stem + ".f32", probs[0]->data, 3);

        // grad-CAM heatmap for conv_layer_3 (uint8 after min-max normalize,
        // alexnet.cpp:95-142); saved as f32 0..255 for easy comparison
        cv::Mat cam = network.grad_cam("conv_layer_3");
        cv::Mat cam_f; cam.convertTo(cam_f, CV_32FC1);
        dump(out_dir + "/gradcam_" + stem + ".f32",
             reinterpret_cast<float*>(cam_f.data), cam.rows * cam.cols);

        manifest << stem << " " << argv[i] << " " << probs[0]->argmax()
                 << " cam " << cam.rows << "x" << cam.cols << "\n";
        std::printf("dumped %s argmax=%d\n", argv[i], probs[0]->argmax());
    }
    return 0;
}

// Per-layer oracle: build the reference's layer stack from its PUBLIC layer
// classes (same order as AlexNet's ctor, alexnet.cpp:10-33), stream the
// checkpoint through each layer's load_weights (same order the AlexNet
// loader uses, alexnet.cpp:80-90), and dump every intermediate activation
// for one preprocessed image. Gives the JAX side layer-by-layer parity
// targets, not just end logits.

#include <cstdio>
#include <fstream>
#include <memory>
#include <string>
#include <vector>

#include <opencv2/imgcodecs.hpp>
#include <opencv2/imgproc.hpp>

#include "architectures.h"

using namespace architectures;

static void dump(const std::string& path, const std::vector<tensor>& t) {
    std::ofstream f(path, std::ios::binary);
    const int n = t[0]->get_length();
    f.write(reinterpret_cast<const char*>(t[0]->data),
            static_cast<std::streamsize>(n * sizeof(float)));
}

int main(int argc, char** argv) {
    if (argc < 4) {
        std::printf("usage: layer_dump <ckpt.model> <image> <out_dir>\n");
        return 1;
    }
    architectures::no_grad = true;

    std::vector<std::shared_ptr<Layer>> layers;
    layers.emplace_back(new Conv2D("conv_layer_1", 3, 16, 3));
    layers.emplace_back(new ReLU("relu_layer_1"));
    layers.emplace_back(new MaxPool2D("max_pool_1", 2, 2));
    layers.emplace_back(new Conv2D("conv_layer_2", 16, 32, 3));
    layers.emplace_back(new ReLU("relu_layer_2"));
    layers.emplace_back(new Conv2D("conv_layer_3", 32, 64, 3));
    layers.emplace_back(new ReLU("relu_layer_3"));
    layers.emplace_back(new Conv2D("conv_layer_4", 64, 128, 3));
    layers.emplace_back(new ReLU("relu_layer_4"));
    layers.emplace_back(new LinearLayer("linear_1", 6 * 6 * 128, 3));

    std::ifstream reader(argv[1], std::ios::binary);
    for (auto& l : layers) l->load_weights(reader);

    cv::Mat img = cv::imread(argv[2]);
    if (img.empty()) { std::printf("unreadable image\n"); return 1; }
    cv::resize(img, img, {224, 224});
    tensor buf(new Tensor3D(3, 224, 224, "in"));
    buf->read_from_opencv_mat(img.data);
    std::vector<tensor> x({buf});

    const std::string out_dir = argv[3];
    std::ofstream manifest(out_dir + "/layers.txt");
    for (auto& l : layers) {
        x = l->forward(x);
        const auto shape = x[0]->get_shape();
        manifest << l->name << " " << std::get<0>(shape) << " "
                 << std::get<1>(shape) << " " << std::get<2>(shape) << "\n";
        dump(out_dir + "/layer_" + l->name + ".f32", x);
        std::printf("%s: %d x %d x %d\n", l->name.c_str(), std::get<0>(shape),
                    std::get<1>(shape), std::get<2>(shape));
    }
    return 0;
}

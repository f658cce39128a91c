// TSan stress: hammer cnn_load_batch from multiple threads concurrently.
#include <cstdint>
#include <cstdio>
#include <thread>
#include <vector>
extern "C" int cnn_load_batch(const char**, int, int, int, uint8_t*);
int main() {
    const char* paths[8];
    for (int i = 0; i < 8; ++i) paths[i] = "/root/reference/datasets/images/dog.jpg";
    auto worker = [&]() {
        std::vector<uint8_t> out(8 * 64 * 64 * 3);
        for (int r = 0; r < 5; ++r)
            if (cnn_load_batch(paths, 8, 64, 4, out.data()) != 0) return;
    };
    std::vector<std::thread> ts;
    for (int t = 0; t < 3; ++t) ts.emplace_back(worker);
    for (auto& t : ts) t.join();
    std::printf("tsan stress done\n");
    return 0;
}

// Fast JSONL experiment-database scanner.
//
// The framework's inter-tier interface is append-only JSONL databases
// (utils/jsonl.py; the convention inherited from the reference, SURVEY.md
// §5.5). LDS collection filters thousands of rows whose remaining_idx
// arrays hold tens of thousands of integers each — python-side
// json.loads-everything is the bottleneck. This library mmaps the DB and
// pre-filters lines by substring match on the serialized "key": value
// condition pairs, returning byte ranges of candidate rows; Python then
// json-parses only the matches (and re-verifies the conditions exactly, so
// the substring pass is a sound over-approximation).
//
// Exposed via the C ABI for ctypes (no pybind11 in this image).

#include <cstdint>
#include <cstring>
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

extern "C" {

// Opens + mmaps a file. Returns a handle id >= 0, or -1 on failure.
struct MappedFile {
    char* data;
    size_t size;
    int fd;
};

static const int kMaxFiles = 64;
static MappedFile g_files[kMaxFiles];
static int g_next = 0;

int jsonl_open(const char* path) {
    if (g_next >= kMaxFiles) return -1;
    int fd = open(path, O_RDONLY);
    if (fd < 0) return -1;
    struct stat st;
    if (fstat(fd, &st) != 0 || st.st_size == 0) {
        close(fd);
        return -1;
    }
    void* data = mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
    if (data == MAP_FAILED) {
        close(fd);
        return -1;
    }
    int id = g_next++;
    g_files[id] = {static_cast<char*>(data), static_cast<size_t>(st.st_size), fd};
    return id;
}

void jsonl_close(int id) {
    if (id < 0 || id >= g_next || g_files[id].data == nullptr) return;
    munmap(g_files[id].data, g_files[id].size);
    close(g_files[id].fd);
    g_files[id].data = nullptr;
}

// Counts newline-terminated lines.
int64_t jsonl_count_lines(int id) {
    if (id < 0 || id >= g_next || g_files[id].data == nullptr) return -1;
    const char* p = g_files[id].data;
    const char* end = p + g_files[id].size;
    int64_t n = 0;
    while (p < end) {
        const char* nl = static_cast<const char*>(memchr(p, '\n', end - p));
        if (!nl) {
            ++n;  // trailing unterminated line
            break;
        }
        ++n;
        p = nl + 1;
    }
    return n;
}

// Scans for lines containing ALL of `num_needles` needle strings
// (concatenated, each NUL-terminated). Writes up to max_out (start, length)
// pairs into out_ranges. Returns the number of matching lines (may exceed
// max_out; caller re-calls with a bigger buffer).
int64_t jsonl_filter(int id, const char* needles, int num_needles,
                     int64_t* out_ranges, int64_t max_out) {
    if (id < 0 || id >= g_next || g_files[id].data == nullptr) return -1;
    const char* base = g_files[id].data;
    const char* end = base + g_files[id].size;

    // Unpack needle offsets.
    const char* needle_ptrs[64];
    size_t needle_lens[64];
    if (num_needles > 64) return -1;
    {
        const char* q = needles;
        for (int i = 0; i < num_needles; ++i) {
            needle_ptrs[i] = q;
            needle_lens[i] = strlen(q);
            q += needle_lens[i] + 1;
        }
    }

    int64_t matches = 0;
    const char* p = base;
    while (p < end) {
        const char* nl = static_cast<const char*>(memchr(p, '\n', end - p));
        const char* line_end = nl ? nl : end;
        size_t len = line_end - p;
        bool ok = true;
        for (int i = 0; i < num_needles && ok; ++i) {
            if (needle_lens[i] > len ||
                memmem(p, len, needle_ptrs[i], needle_lens[i]) == nullptr) {
                ok = false;
            }
        }
        if (ok) {
            if (matches < max_out) {
                out_ranges[2 * matches] = p - base;
                out_ranges[2 * matches + 1] = static_cast<int64_t>(len);
            }
            ++matches;
        }
        if (!nl) break;
        p = nl + 1;
    }
    return matches;
}

// Copies a byte range into the caller's buffer (for ctypes string reads).
int64_t jsonl_read_range(int id, int64_t start, int64_t length, char* out) {
    if (id < 0 || id >= g_next || g_files[id].data == nullptr) return -1;
    if (start < 0 || static_cast<size_t>(start + length) > g_files[id].size)
        return -1;
    memcpy(out, g_files[id].data + start, length);
    return length;
}

}  // extern "C"

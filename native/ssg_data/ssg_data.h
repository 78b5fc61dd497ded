// ssg_data — native host-side data pipeline for the ssg_tpu framework.
//
// TPU-native equivalent of the reference's third-party input path
// (PIL decode + torchvision transforms inside DataLoader workers,
// SURVEY.md §2 "Native compute" row): fused JPEG/PNG/PPM decode +
// bilinear resize + batch assembly on a thread pool, plus a
// background-prefetching batch loader so host decode overlaps device
// compute. Exposed as a C API for ctypes binding
// (ssg_tpu/data/native_loader.py).
#ifndef SSG_DATA_H_
#define SSG_DATA_H_

#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

// ---- error codes ----------------------------------------------------------
enum {
  SSG_OK = 0,
  SSG_ERR_OPEN = 1,     // file missing / unreadable
  SSG_ERR_DECODE = 2,   // corrupt or unsupported image
  SSG_ERR_ARG = 3,      // bad argument
};

// Decode one image file (JPEG/PNG/PPM, sniffed by magic bytes) and
// bilinear-resize to (out_h, out_w). `out` must hold out_h*out_w*3 bytes
// (RGB, HWC). Returns an SSG_* code.
int ssg_decode_resize(const char* path, int out_h, int out_w, uint8_t* out);

// Decode + resize a batch of `n` files into `out` (n, out_h, out_w, 3),
// fanned out over `num_threads` workers (<=0 -> hardware concurrency).
// Failed items are zero-filled and their index recorded in `err_idx`
// (caller-allocated, length n, -1 terminated) when non-NULL.
// Returns the number of failed items.
int ssg_load_batch(const char** paths, int n, int out_h, int out_w,
                   uint8_t* out, int num_threads, int* err_idx);

// ---- prefetching batch loader ---------------------------------------------
// Owns a copy of the path list; a worker pool decodes batches ahead of the
// consumer into a bounded queue (depth `prefetch`). Tail batch is zero-padded
// to batch_size; *valid reports its real row count.
typedef struct ssg_loader ssg_loader;

ssg_loader* ssg_loader_create(const char** paths, int n, int batch_size,
                              int out_h, int out_w, int num_threads,
                              int prefetch);
// Copy the next batch into `out` (batch_size, h, w, 3). Returns 1 and sets
// *valid (rows of real data) while batches remain, 0 at end of epoch.
int ssg_loader_next(ssg_loader* L, uint8_t* out, int* valid);
// Restart iteration from the beginning (same order).
void ssg_loader_reset(ssg_loader* L);
void ssg_loader_destroy(ssg_loader* L);

// Library version / availability probe.
int ssg_data_version(void);

#ifdef __cplusplus
}  // extern "C"
#endif

#endif  // SSG_DATA_H_

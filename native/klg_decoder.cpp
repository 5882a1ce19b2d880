// Native .klg log decoder — the TPU framework's equivalent of the
// reference's RawLogReader decode path (/root/reference/Tools/
// RawLogReader.cpp:64-97 + Tools/JPEGLoader.h), built as a small shared
// library driven from Python via ctypes (see elasticfusion_tpu/io/klg.py).
//
// Format: int32 numFrames, then per frame
//   int64 timestamp_us, int32 depthSize, int32 imageSize,
//   depthSize bytes (zlib uint16[h*w] mm, or raw if depthSize == h*w*2),
//   imageSize bytes (JPEG, or raw u8[h*w*3] if imageSize == h*w*3; 0 = none).
//
// The file is mmapped and an offset index is built once, so random access
// (rewind/fastForward) is O(1) and decode is the only per-frame cost.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

#include <jpeglib.h>
#include <zlib.h>

namespace {

struct KlgFile {
  int fd = -1;
  const uint8_t* data = nullptr;
  size_t size = 0;
  int width = 0;
  int height = 0;
  int32_t num_frames = 0;
  std::vector<size_t> offsets;  // offset of each frame header
};

struct FrameHeader {
  int64_t timestamp;
  int32_t depth_size;
  int32_t image_size;
};

bool read_header(const KlgFile* f, size_t off, FrameHeader* h) {
  if (off + 16 > f->size) return false;
  std::memcpy(&h->timestamp, f->data + off, 8);
  std::memcpy(&h->depth_size, f->data + off + 8, 4);
  std::memcpy(&h->image_size, f->data + off + 12, 4);
  if (h->depth_size < 0 || h->image_size < 0) return false;
  if (off + 16 + (size_t)h->depth_size + (size_t)h->image_size > f->size)
    return false;
  return true;
}

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  JpegErrorMgr* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Decode a JPEG buffer into rgb_out (h*w*3, RGB). Returns 0 on success.
int decode_jpeg(const uint8_t* buf, size_t len, int width, int height,
                uint8_t* rgb_out) {
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(buf), len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return -2;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  if ((int)cinfo.output_width != width || (int)cinfo.output_height != height) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return -3;
  }
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = rgb_out + (size_t)cinfo.output_scanline * width * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

}  // namespace

extern "C" {

// Returns an opaque handle, or null on failure.
void* ef_klg_open(const char* path, int width, int height) {
  KlgFile* f = new KlgFile();
  f->width = width;
  f->height = height;
  f->fd = open(path, O_RDONLY);
  if (f->fd < 0) { delete f; return nullptr; }
  struct stat st;
  if (fstat(f->fd, &st) != 0 || st.st_size < 4) {
    close(f->fd); delete f; return nullptr;
  }
  f->size = (size_t)st.st_size;
  f->data = (const uint8_t*)mmap(nullptr, f->size, PROT_READ, MAP_PRIVATE, f->fd, 0);
  if (f->data == MAP_FAILED) { close(f->fd); delete f; return nullptr; }
  std::memcpy(&f->num_frames, f->data, 4);
  // index all frame offsets up front
  size_t off = 4;
  f->offsets.reserve(f->num_frames > 0 ? f->num_frames : 0);
  for (int32_t i = 0; i < f->num_frames; i++) {
    FrameHeader h;
    if (!read_header(f, off, &h)) break;
    f->offsets.push_back(off);
    off += 16 + (size_t)h.depth_size + (size_t)h.image_size;
  }
  f->num_frames = (int32_t)f->offsets.size();
  return f;
}

int ef_klg_num_frames(void* handle) {
  return handle ? ((KlgFile*)handle)->num_frames : -1;
}

// Decode frame `idx` into caller-provided buffers. depth_out: h*w uint16,
// rgb_out: h*w*3 uint8, ts_out: int64. Returns 0 on success.
int ef_klg_read(void* handle, int idx, uint16_t* depth_out, uint8_t* rgb_out,
                int64_t* ts_out) {
  if (!handle) return -1;
  KlgFile* f = (KlgFile*)handle;
  if (idx < 0 || idx >= f->num_frames) return -2;
  FrameHeader h;
  if (!read_header(f, f->offsets[idx], &h)) return -3;
  *ts_out = h.timestamp;
  const uint8_t* depth_buf = f->data + f->offsets[idx] + 16;
  const uint8_t* image_buf = depth_buf + h.depth_size;
  const size_t n_px = (size_t)f->width * f->height;

  if ((size_t)h.depth_size == n_px * 2) {
    std::memcpy(depth_out, depth_buf, n_px * 2);
  } else {
    uLongf dest_len = n_px * 2;
    if (uncompress((Bytef*)depth_out, &dest_len, depth_buf, h.depth_size) != Z_OK ||
        dest_len != n_px * 2)
      return -4;
  }

  if ((size_t)h.image_size == n_px * 3) {
    std::memcpy(rgb_out, image_buf, n_px * 3);
  } else if (h.image_size > 0) {
    if (decode_jpeg(image_buf, h.image_size, f->width, f->height, rgb_out) != 0)
      return -5;
  } else {
    std::memset(rgb_out, 0, n_px * 3);
  }
  return 0;
}

void ef_klg_close(void* handle) {
  if (!handle) return;
  KlgFile* f = (KlgFile*)handle;
  munmap((void*)f->data, f->size);
  close(f->fd);
  delete f;
}

}  // extern "C"

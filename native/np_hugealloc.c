/* np_hugealloc: a NumPy data-memory handler that serves large
 * allocations from anonymous mmap with MADV_HUGEPAGE.
 *
 * Why: this class of host (1 vCPU, hypervisor-managed memory,
 * transparent_hugepage defrag=defer+madvise) first-touches plain
 * malloc'd pages at 8-400 MB/s but madvise(MADV_HUGEPAGE)'d regions at
 * ~1.4 GB/s (measured; docs/PERF_NOTES.md round 5).  The BELL hierarchy
 * build streams multi-GB numpy buffers (unit-Ke planes, sort keys,
 * scatter planes), so page-fault cost WAS the build wall-clock.
 *
 * Design: every allocation carries a 64-byte header (magic + kind +
 * size) so free/realloc can route back to the right arena.  Small
 * allocations delegate to malloc; allocations >= NPHA_THRESHOLD come
 * from mmap + MADV_HUGEPAGE (anonymous mmap is already zero-filled, so
 * calloc is free).  numpy >= 1.22 keeps a reference to the handler on
 * each ndarray, so arrays allocated before installation free through
 * their original handler — installation is safe at any point.
 *
 * No counterpart in the reference (pure Julia, relies on libc).
 */
#define PY_SSIZE_T_CLEAN
#include <Python.h>
#define NPY_NO_DEPRECATED_API NPY_1_22_API_VERSION
#define NPY_TARGET_VERSION NPY_1_22_API_VERSION
#include <numpy/arrayobject.h>

#include <pthread.h>
#include <stdint.h>
#include <string.h>
#include <stdlib.h>
#include <sys/mman.h>

#define NPHA_MAGIC 0x4e504841677561ULL /* "NPHAgua" */
#define NPHA_HDR 64
#define NPHA_THRESHOLD (4u << 20)

typedef struct {
    uint64_t magic;
    uint64_t kind; /* 0 = malloc, 1 = mmap */
    uint64_t map_size; /* total mapped/alloc'd bytes incl. header */
} npha_hdr;

/* Free-cache of recently munmap-able blocks: fresh memory from the
 * hypervisor faults at 8-400 MB/s on this VM while recycled pages run
 * at GB/s, so holding the last few big blocks for exact-size reuse
 * buys the glibc-heap reuse behavior without losing hugepages.  The
 * cache is capped (bytes + slots) and exact-size matched — the build's
 * big buffers repeat identical shapes across levels and density swaps.
 * Reused blocks are NOT re-zeroed; calloc therefore bypasses the cache
 * (numpy's zeroed allocations are rare on the hot path).
 */
#define NPHA_CACHE_SLOTS 16
#define NPHA_CACHE_BYTES (6ull << 30)

static pthread_mutex_t npha_lock = PTHREAD_MUTEX_INITIALIZER;
static struct {
    void *ptr;
    size_t total;
} npha_cache[NPHA_CACHE_SLOTS];
static size_t npha_cache_bytes = 0;

static void *npha_cache_take(size_t total) {
    int i;
    void *p = NULL;
    pthread_mutex_lock(&npha_lock);
    for (i = 0; i < NPHA_CACHE_SLOTS; i++) {
        if (npha_cache[i].ptr != NULL && npha_cache[i].total == total) {
            p = npha_cache[i].ptr;
            npha_cache[i].ptr = NULL;
            npha_cache_bytes -= total;
            break;
        }
    }
    pthread_mutex_unlock(&npha_lock);
    return p;
}

static int npha_cache_put(void *p, size_t total) {
    int i;
    pthread_mutex_lock(&npha_lock);
    if (npha_cache_bytes + total <= NPHA_CACHE_BYTES) {
        for (i = 0; i < NPHA_CACHE_SLOTS; i++) {
            if (npha_cache[i].ptr == NULL) {
                npha_cache[i].ptr = p;
                npha_cache[i].total = total;
                npha_cache_bytes += total;
                pthread_mutex_unlock(&npha_lock);
                return 1;
            }
        }
    }
    pthread_mutex_unlock(&npha_lock);
    return 0;
}

static void *npha_raw_alloc(size_t size, int zero) {
    size_t total = size + NPHA_HDR;
    npha_hdr *h;
    if (size >= NPHA_THRESHOLD) {
        void *p = zero ? NULL : npha_cache_take(total);
        if (p == NULL) {
            p = mmap(NULL, total, PROT_READ | PROT_WRITE,
                     MAP_PRIVATE | MAP_ANONYMOUS, -1, 0);
            if (p != MAP_FAILED)
                (void)madvise(p, total, MADV_HUGEPAGE);
        }
        if (p != MAP_FAILED && p != NULL) {
            h = (npha_hdr *)p;
            h->magic = NPHA_MAGIC;
            h->kind = 1;
            h->map_size = total;
            return (char *)p + NPHA_HDR;
        }
        /* fall through to malloc on mmap failure */
    }
    h = (npha_hdr *)(zero ? calloc(1, total) : malloc(total));
    if (h == NULL)
        return NULL;
    h->magic = NPHA_MAGIC;
    h->kind = 0;
    h->map_size = total;
    return (char *)h + NPHA_HDR;
}

static npha_hdr *npha_header(void *ptr) {
    npha_hdr *h = (npha_hdr *)((char *)ptr - NPHA_HDR);
    return h->magic == NPHA_MAGIC ? h : NULL;
}

static void *npha_malloc(void *ctx, size_t size) {
    (void)ctx;
    return npha_raw_alloc(size ? size : 1, 0);
}

static void *npha_calloc(void *ctx, size_t nelem, size_t elsize) {
    size_t size = nelem * elsize;
    (void)ctx;
    if (elsize && size / elsize != nelem)
        return NULL;
    /* anonymous mmap is zero-filled; calloc handles the malloc arena */
    return npha_raw_alloc(size ? size : 1, 1);
}

static void npha_free(void *ctx, void *ptr, size_t size) {
    npha_hdr *h;
    (void)ctx;
    (void)size;
    if (ptr == NULL)
        return;
    h = npha_header(ptr);
    if (h == NULL) /* never ours: corruption guard, leak instead of UB */
        return;
    if (h->kind == 1) {
        if (!npha_cache_put((void *)h, h->map_size))
            munmap((void *)h, h->map_size);
    } else
        free(h);
}

static void *npha_realloc(void *ctx, void *ptr, size_t new_size) {
    npha_hdr *h;
    size_t total;
    (void)ctx;
    if (ptr == NULL)
        return npha_raw_alloc(new_size ? new_size : 1, 0);
    h = npha_header(ptr);
    if (h == NULL)
        return NULL;
    total = new_size + NPHA_HDR;
    if (h->kind == 1) {
        void *p = mremap((void *)h, h->map_size, total, MREMAP_MAYMOVE);
        if (p == MAP_FAILED)
            return NULL;
        h = (npha_hdr *)p;
        h->map_size = total;
        return (char *)p + NPHA_HDR;
    }
    if (new_size + NPHA_HDR >= NPHA_THRESHOLD) {
        /* crossing into the mmap arena: copy over */
        void *np_ = npha_raw_alloc(new_size, 0);
        if (np_ == NULL)
            return NULL;
        memcpy(np_, ptr, h->map_size - NPHA_HDR < new_size
                             ? h->map_size - NPHA_HDR
                             : new_size);
        free(h);
        return np_;
    }
    h = (npha_hdr *)realloc(h, total);
    if (h == NULL)
        return NULL;
    h->map_size = total;
    return (char *)h + NPHA_HDR;
}

static PyDataMem_Handler npha_handler = {
    "np_hugealloc",
    1,
    {
        NULL, /* ctx */
        npha_malloc,
        npha_calloc,
        npha_realloc,
        npha_free,
    },
};

static PyObject *npha_install(PyObject *self, PyObject *args) {
    PyObject *cap, *old;
    (void)self;
    (void)args;
    cap = PyCapsule_New(&npha_handler, "mem_handler", NULL);
    if (cap == NULL)
        return NULL;
    old = PyDataMem_SetHandler(cap);
    Py_DECREF(cap);
    if (old == NULL)
        return NULL;
    Py_DECREF(old);
    Py_RETURN_NONE;
}

static PyMethodDef npha_methods[] = {
    {"install", npha_install, METH_NOARGS,
     "Install the hugepage-backed numpy data-memory handler."},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef npha_module = {
    PyModuleDef_HEAD_INIT, "np_hugealloc",
    "Hugepage-backed numpy allocator (MADV_HUGEPAGE for >=4MB).",
    -1, npha_methods, NULL, NULL, NULL, NULL,
};

PyMODINIT_FUNC PyInit_np_hugealloc(void) {
    import_array();
    return PyModule_Create(&npha_module);
}

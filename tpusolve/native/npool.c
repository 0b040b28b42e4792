/* npool — pooling numpy data allocator.
 *
 * Large numpy temporaries default to per-allocation mmap, and glibc
 * munmaps them on free; on paravirtualized hosts a fresh-mmap page fault
 * costs ~45 us/4KB, so GB-scale setup phases become allocation-bound
 * (observed: processes spending >90% of CPU in exc_page_fault once the
 * main-arena brk is blocked by the JAX runtime's own mappings).
 *
 * This handler carves large blocks from one persistent MAP_NORESERVE
 * arena with power-of-two freelists: pages fault once for the lifetime
 * of the process and are reused forever after.  Rounding waste is virtual
 * only (tail pages are never touched).  numpy's free() passes the size,
 * so blocks need no headers.  Small allocations fall through to malloc.
 *
 * Installed at import by tpusolve/__init__ (PyDataMem_SetHandler).
 */
#define PY_SSIZE_T_CLEAN
#include <Python.h>
#define NPY_NO_DEPRECATED_API NPY_1_22_API_VERSION
#define NPY_TARGET_VERSION NPY_1_22_API_VERSION
#include <numpy/arrayobject.h>

#include <pthread.h>
#include <string.h>
#include <sys/mman.h>

#define ARENA_BYTES (64ULL << 30)   /* virtual reservation only */
#define MIN_POOL (1ULL << 20)       /* pool blocks >= 1 MB */
#define NBUCKETS 26                 /* 1MB << (0..25) -> up to 32TB */

static char *arena_base = NULL;
static size_t arena_cursor = 0;
static void *freelist[NBUCKETS];
static pthread_mutex_t lock = PTHREAD_MUTEX_INITIALIZER;

static int bucket_of(size_t sz) {
    int b = 0;
    size_t cap = MIN_POOL;
    while (cap < sz && b < NBUCKETS - 1) { cap <<= 1; ++b; }
    return b;
}

static void *pool_alloc(size_t sz) {
    if (arena_base == NULL || sz > (ARENA_BYTES >> 2)) return malloc(sz);
    int b = bucket_of(sz);
    size_t cap = MIN_POOL << b;
    pthread_mutex_lock(&lock);
    void *p = freelist[b];
    if (p != NULL) {
        freelist[b] = *(void **)p;
        pthread_mutex_unlock(&lock);
        return p;
    }
    if (arena_cursor + cap > ARENA_BYTES) {
        pthread_mutex_unlock(&lock);
        return malloc(sz);
    }
    p = arena_base + arena_cursor;
    arena_cursor += cap;
    pthread_mutex_unlock(&lock);
    return p;
}

static int from_arena(void *p) {
    return arena_base != NULL && (char *)p >= arena_base
           && (char *)p < arena_base + ARENA_BYTES;
}

static void pool_free_sized(void *p, size_t sz) {
    if (!from_arena(p)) { free(p); return; }
    int b = bucket_of(sz);
    pthread_mutex_lock(&lock);
    *(void **)p = freelist[b];
    freelist[b] = p;
    pthread_mutex_unlock(&lock);
}

/* ---- PyDataMem_Handler hooks ---- */
static void *h_malloc(void *ctx, size_t sz) {
    (void)ctx;
    if (sz < MIN_POOL) return malloc(sz);
    return pool_alloc(sz);
}

static void *h_calloc(void *ctx, size_t nelem, size_t elsize) {
    (void)ctx;
    size_t sz = nelem * elsize;
    if (sz < MIN_POOL) return calloc(nelem, elsize);
    void *p = pool_alloc(sz);
    if (p != NULL && from_arena(p)) memset(p, 0, sz);
    else if (p != NULL) memset(p, 0, sz);
    return p;
}

static void *h_realloc(void *ctx, void *p, size_t new_sz) {
    (void)ctx;
    if (p == NULL) return h_malloc(ctx, new_sz);
    if (!from_arena(p)) {
        if (new_sz >= MIN_POOL) {
            /* moving into the pool needs the old size, which realloc does
               not provide — keep it in glibc */
            return realloc(p, new_sz);
        }
        return realloc(p, new_sz);
    }
    /* arena block: its capacity is the bucket it came from; but we do not
       know the bucket without the old size.  numpy reallocs data buffers
       rarely (resize); allocate fresh with a conservative copy of new_sz
       bytes (may over-read within the arena, which is mapped). */
    void *q = h_malloc(ctx, new_sz);
    if (q != NULL) memcpy(q, p, new_sz);
    /* old block's bucket unknown: conservatively place it in the bucket
       matching the smallest capacity >= new_sz is wrong; leak it instead
       (bounded by rare numpy reallocs). */
    return q;
}

static void h_free(void *ctx, void *p, size_t sz) {
    (void)ctx;
    if (p == NULL) return;
    if (sz < MIN_POOL && !from_arena(p)) { free(p); return; }
    pool_free_sized(p, sz);
}

static PyDataMem_Handler pool_handler = {
    "tpusolve_pool_allocator",
    1,
    {
        NULL,
        h_malloc,
        h_calloc,
        h_realloc,
        h_free,
    },
};

static PyObject *py_install(PyObject *self, PyObject *args) {
    (void)self; (void)args;
    if (arena_base == NULL) {
        void *m = mmap(NULL, ARENA_BYTES, PROT_READ | PROT_WRITE,
                       MAP_PRIVATE | MAP_ANONYMOUS | MAP_NORESERVE, -1, 0);
        if (m == MAP_FAILED) {
            PyErr_SetString(PyExc_OSError, "npool: arena mmap failed");
            return NULL;
        }
        /* no MADV_HUGEPAGE here: on UFFD/snapshot-backed VMs a hugepage
           fault can stall seconds in direct compaction.  The arena's
           value is that pages fault ONCE for the process lifetime. */
        arena_base = (char *)m;
    }
    PyObject *cap = PyCapsule_New(&pool_handler, "mem_handler", NULL);
    if (cap == NULL) return NULL;
    PyObject *old = PyDataMem_SetHandler(cap);
    Py_DECREF(cap);
    if (old == NULL) return NULL;
    return old;   /* previous handler capsule (caller may keep or drop) */
}

static PyObject *py_stats(PyObject *self, PyObject *args) {
    (void)self; (void)args;
    return Py_BuildValue("nn", (Py_ssize_t)arena_cursor,
                         (Py_ssize_t)ARENA_BYTES);
}

static PyMethodDef methods[] = {
    {"install", py_install, METH_NOARGS,
     "Install the pooling numpy data allocator; returns the old handler."},
    {"stats", py_stats, METH_NOARGS, "(cursor_bytes, arena_bytes)"},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "npool", NULL, -1, methods,
    NULL, NULL, NULL, NULL,
};

PyMODINIT_FUNC PyInit_npool(void) {
    PyObject *m = PyModule_Create(&moduledef);
    if (m == NULL) return NULL;
    import_array();
    return m;
}

/* Minimal stand-in for libosmocore's talloc.h (oracle build only). */
#ifndef STUB_OSMOCOM_TALLOC_H
#define STUB_OSMOCOM_TALLOC_H

#include <stdlib.h>

#define talloc_zero(ctx, type) ((type *)calloc(1, sizeof(type)))
#define talloc_zero_array(ctx, type, n) ((type *)calloc((n), sizeof(type)))
#define talloc_realloc(ctx, ptr, type, n) \
	((type *)realloc((ptr), (size_t)(n) * sizeof(type)))
#define talloc_free(ptr) free(ptr)

extern void *tetra_tall_ctx;

#endif

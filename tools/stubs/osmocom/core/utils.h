/* Minimal stand-in for libosmocore's utils.h, used only to compile the
 * read-only reference kernels in /root/reference as a golden-vector oracle.
 * Provides just the declarations those translation units need. */
#ifndef STUB_OSMOCOM_UTILS_H
#define STUB_OSMOCOM_UTILS_H

#include <stdint.h>
#include <stddef.h>

/* the reference's crypto units use talloc_* through libosmocore's
 * header chain without a direct include; route them to the stub */
#include <osmocom/core/talloc.h>

#define ARRAY_SIZE(x) (sizeof(x) / sizeof((x)[0]))

struct value_string {
	uint32_t value;
	const char *str;
};

const char *get_value_string(const struct value_string *vs, uint32_t value);
char *osmo_hexdump(const unsigned char *buf, int len);
char *osmo_ubit_dump(const uint8_t *bits, unsigned int len);

#endif

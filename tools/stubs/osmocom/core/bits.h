/* Minimal stand-in for libosmocore's bits.h (oracle build only). */
#ifndef STUB_OSMOCOM_BITS_H
#define STUB_OSMOCOM_BITS_H

#include <stdint.h>

typedef uint8_t ubit_t;	/* unpacked bit, 1 bit per byte */
typedef int8_t sbit_t;	/* soft bit, -127..127 */
typedef uint8_t pbit_t;	/* packed bits, 8 per byte */

/* the LLC/MLE units call this via libosmocore's header chain; an
 * implicit int declaration would truncate the returned pointer */
char *osmo_ubit_dump(const uint8_t *bits, unsigned int len);

#define osmo_pbit_bytesize(bits) (((bits) + 7) / 8)

/* unpacked -> packed bits, MSB first (libosmocore semantics) */
static inline int osmo_ubit2pbit(pbit_t *out, const ubit_t *in,
				 unsigned int num_bits)
{
	unsigned int i, bytes = osmo_pbit_bytesize(num_bits);
	for (i = 0; i < bytes; i++)
		out[i] = 0;
	for (i = 0; i < num_bits; i++)
		if (in[i])
			out[i / 8] |= 0x80 >> (i % 8);
	return bytes;
}

#endif

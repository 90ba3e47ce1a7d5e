/* Minimal stand-in for libosmocore's bits.h (oracle build only). */
#ifndef STUB_OSMOCOM_BITS_H
#define STUB_OSMOCOM_BITS_H

#include <stdint.h>

typedef uint8_t ubit_t;	/* unpacked bit, 1 bit per byte */
typedef int8_t sbit_t;	/* soft bit, -127..127 */
typedef uint8_t pbit_t;	/* packed bits, 8 per byte */

#endif

/* Minimal stand-in for libosmocore's prim.h (oracle build only). */
#ifndef STUB_OSMOCOM_PRIM_H
#define STUB_OSMOCOM_PRIM_H

#include <osmocom/core/msgb.h>

enum osmo_prim_operation {
	PRIM_OP_REQUEST,
	PRIM_OP_RESPONSE,
	PRIM_OP_INDICATION,
	PRIM_OP_CONFIRM,
};

struct osmo_prim_hdr {
	unsigned int sap;
	unsigned int primitive;
	enum osmo_prim_operation operation;
	struct msgb *msg;
};

#endif

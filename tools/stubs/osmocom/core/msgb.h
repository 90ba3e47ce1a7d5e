/* Minimal stand-in for libosmocore's msgb.h (oracle build only).
 * Provides exactly the fields/functions the reference lower MAC uses:
 * head/tail/len/data, l1h..l4h, msgb_alloc/msgb_put/msgb_l1len. */
#ifndef STUB_OSMOCOM_MSGB_H
#define STUB_OSMOCOM_MSGB_H

#include <stdint.h>
#include <stdlib.h>

struct msgb {
	unsigned char *l1h, *l2h, *l3h, *l4h;
	unsigned int data_len;	/* buffer capacity */
	unsigned int len;	/* used length (tail - head) */
	unsigned char *head;
	unsigned char *tail;
	unsigned char *data;
	unsigned char _data[0];
};

static inline struct msgb *msgb_alloc(unsigned int size, const char *name)
{
	struct msgb *msg = (struct msgb *)calloc(1, sizeof(struct msgb) + size);
	(void)name;
	if (!msg)
		return NULL;
	msg->data_len = size;
	msg->head = msg->tail = msg->data = msg->_data;
	msg->len = 0;
	return msg;
}

static inline unsigned char *msgb_put(struct msgb *msg, unsigned int len)
{
	unsigned char *tmp = msg->tail;
	msg->tail += len;
	msg->len += len;
	return tmp;
}

static inline unsigned int msgb_l1len(const struct msgb *msg)
{
	return msg->tail - msg->l1h;
}

static inline unsigned int msgb_l2len(const struct msgb *msg)
{
	return msg->tail - msg->l2h;
}

static inline unsigned int msgb_l3len(const struct msgb *msg)
{
	return msg->tail - msg->l3h;
}

#endif

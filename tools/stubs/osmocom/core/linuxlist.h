/* Minimal stand-in for libosmocore's linuxlist.h (oracle build only). */
#ifndef STUB_OSMOCOM_LINUXLIST_H
#define STUB_OSMOCOM_LINUXLIST_H

struct llist_head {
	struct llist_head *next, *prev;
};

#define LLIST_HEAD_INIT(name) { &(name), &(name) }

static inline void INIT_LLIST_HEAD(struct llist_head *h)
{
	h->next = h;
	h->prev = h;
}

#endif

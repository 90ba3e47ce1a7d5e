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

static inline void llist_add(struct llist_head *_new, struct llist_head *head)
{
	_new->next = head->next;
	_new->prev = head;
	head->next->prev = _new;
	head->next = _new;
}

static inline void llist_del(struct llist_head *entry)
{
	entry->next->prev = entry->prev;
	entry->prev->next = entry->next;
	entry->next = entry->prev = entry;
}

#ifndef container_of
#define container_of(ptr, type, member) \
	((type *)((char *)(ptr) - offsetof(type, member)))
#endif
#define llist_entry(ptr, type, member) container_of(ptr, type, member)

#define llist_for_each_entry(pos, head, member)				\
	for (pos = llist_entry((head)->next, __typeof__(*pos), member);	\
	     &pos->member != (head);					\
	     pos = llist_entry(pos->member.next, __typeof__(*pos), member))

#include <stddef.h>

#endif

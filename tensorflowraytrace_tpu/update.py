"""Recursive update propagation for the stateful compatibility layer.

Reference counterpart: /root/reference/tfrt/update.py (78 LoC).  The core of
this rebuild is functional (scenes are pure functions of parameters,
SURVEY.md section 7 item 2), but the reference's object API is kept for
users migrating scripts: ``RecursivelyUpdatable`` runs its children's update
handles, then its own ``_update``, then post-update handles
(update.py:42-66), gated by ``frozen``.
"""

from __future__ import annotations


class RecursivelyUpdatable:
    """Base for objects whose state must be recomputed on demand
    (update.py:3-51).

    Attributes
    ----------
    update_handles : list of callables run before self._update
    post_update_handles : list of callables run after self._update
    frozen : if True, update() does nothing
    recursively_update : if False, only self._update runs (no handles)
    """

    def __init__(self, update_handles=None, post_update_handles=None,
                 recursively_update=True, **kwargs):
        self.frozen = False
        self.recursively_update = recursively_update
        if update_handles is None:
            self.update_handles = list(self._generate_update_handles())
        else:
            self.update_handles = list(update_handles)
        self.post_update_handles = list(post_update_handles or [])

    def _generate_update_handles(self):
        return []

    def _update(self):
        raise NotImplementedError

    def update(self):
        if self.frozen:
            return
        if self.recursively_update:
            for handle in self.update_handles:
                handle()
        self._update()
        for handle in self.post_update_handles:
            handle()

    def forced_update(self):
        """Update even when frozen (update.py:62-66)."""
        frozen = self.frozen
        self.frozen = False
        try:
            self.update()
        finally:
            self.frozen = frozen

"""Placeholder — queries land in this module incrementally."""

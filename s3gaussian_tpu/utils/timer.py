"""Pause-able wall-clock timer (parity: utils/timer.py in the reference)."""

from __future__ import annotations

import time


class Timer:
    def __init__(self):
        self.start_time = None
        self.elapsed = 0.0
        self.paused = False

    def start(self):
        if self.start_time is None:
            self.start_time = time.time()
        elif self.paused:
            self.start_time = time.time() - self.elapsed
            self.paused = False

    def pause(self):
        if not self.paused and self.start_time is not None:
            self.elapsed = time.time() - self.start_time
            self.paused = True

    def get_elapsed_time(self) -> float:
        if self.start_time is None:
            return 0.0
        if self.paused:
            return self.elapsed
        return time.time() - self.start_time

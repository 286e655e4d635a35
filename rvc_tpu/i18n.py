"""Locale string maps (reference i18n/__init__.py:5-28)."""
from __future__ import annotations

import json
import locale
import os

I18N_DIR = os.path.join(os.path.dirname(__file__), "locales")


class I18nAuto:
    def __init__(self, language: str | None = None):
        if language in (None, "auto"):
            language = locale.getdefaultlocale()[0] or "en_US"
        path = os.path.join(I18N_DIR, f"{language}.json")
        if not os.path.exists(path):
            language = "en_US"
            path = os.path.join(I18N_DIR, f"{language}.json")
        self.language = language
        self.language_map: dict[str, str] = {}
        if os.path.exists(path):
            with open(path, encoding="utf-8") as f:
                self.language_map = json.load(f)

    def __call__(self, key: str) -> str:
        return self.language_map.get(key, key)

    def print(self) -> None:
        print(f"Using Language: {self.language}")

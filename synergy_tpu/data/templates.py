"""Prompt templates for prompt-mode (non-captioned) text generation.

Behavioral data matching the reference's 72-entry TEMPLATES table
(reference dataset.py:20-104, itself derived from the public CLIP prompt list).
The table is highly regular, so we generate it from its structure.

Zero-shot evaluation uses two extra fixed prompts (reference ZS/ZS_image_task.py:1457,
ZS/ZS_audio_task.py prompt):
  * images: 'this is a photo of {}'
  * audio:  'this is a sound of {}'
"""

from __future__ import annotations

from typing import List

_SUBJECTS = (
    "a video",
    "a example",
    "a demonstration",
    "a photo and sound",
    "a photo and audio",
    "a image and sound",
    "a image and audio",
)
_FORMS = (
    "of {}.",
    "about {}.",
    "of using {}.",
    "of doing {}.",
    "of during {}.",
    "of performing {}.",
)
_THIS_IS = (
    "a video",
    "a demonstration",
    "a photo and sound",
    "a photo and audio",
    "a image and sound",
    "a image and audio",
)
_QUALITY = ("bad", "good")
_RECORDED = (
    "video of {}",
    "photo and sound of {}",
    "photo and audio about {}",
    "image and sound of {}",
    "image and audio about {}",
)


def _build_templates() -> List[str]:
    out: List[str] = []
    for subj in _SUBJECTS:
        out.extend(f"{subj} {form}" for form in _FORMS)
    out.extend(f"this is {subj} of {{}}" for subj in _THIS_IS)
    for quality in _QUALITY:
        out.extend(f"a {quality} {subj[2:]} of {{}}." for subj in _SUBJECTS)
    for person in ("I've", "you've"):
        out.extend(f"{stem} {person} taken and recorded." for stem in _RECORDED)
    return out


TEMPLATES: List[str] = _build_templates()

ZS_IMAGE_PROMPT = "this is a photo of {}"
ZS_AUDIO_PROMPT = "this is a sound of {}"

assert len(TEMPLATES) == 72

"""Evaluation prompt templates keyed by experiment type.

Role parity with `/root/reference/evaluation/prompt_templates.py`
(``get_pos_neg_temps`` keyed by the prompt-file name): positive/negative
template pairs wrapped around the pseudo-word phrase.
"""
from __future__ import annotations

from typing import Tuple

POS_SINGLE = "a photo of {}, fine face, centered, portrait, high quality"
NEG_SINGLE = ("lowres, bad anatomy, bad hands, cropped, worst quality, "
              "deformed face, blurry")

POS_ACTION = "{}, photorealistic, detailed face, sharp focus"
NEG_ACTION = NEG_SINGLE

POS_TWO = ("a photo of {} together, two people, detailed faces, "
           "high quality")
NEG_TWO = NEG_SINGLE

POS_STYLE = "{}, artstation, highly detailed, digital painting"
NEG_STYLE = "lowres, bad anatomy, watermark, signature"

_BY_KEY = {
    "single": (POS_SINGLE, NEG_SINGLE),
    "action": (POS_ACTION, NEG_ACTION),
    "two": (POS_TWO, NEG_TWO),
    "style": (POS_STYLE, NEG_STYLE),
}


def get_pos_neg_temps(prompt_file_name: str) -> Tuple[str, str]:
    """Pick templates from the prompt-file name, like the reference keys on
    e.g. 'exp_action_two.txt' -> 'two' templates."""
    name = prompt_file_name.lower()
    for key in ("two", "action", "style", "single"):
        if key in name:
            return _BY_KEY[key]
    return _BY_KEY["single"]

"""Golden prompt-string parity: every face_or_frame mode must produce a
byte-identical prompt to the reference templates (reference:
my_affectgpt/datasets/datasets/base_dataset.py:798-912). The expected
strings below are LITERALS captured from the reference — if a template
drifts (as `faceframe` did in round 1), this test fails.
"""

from affectgpt_tpu import prompts

SUB = "I am fine."
MSG = "Please describe the emotion."
NV = "AU12 lip corner puller; upbeat tone"

_TAIL = (
    "The subtitle of this video is: <Subtitle>I am fine.</Subtitle>. "
    "Now, please answer my question based on all the provided information. "
    "Please describe the emotion. ###Assistant: "
)
_TAIL_NOSUB = (
    "Now, please answer my question based on all the provided information. "
    "Please describe the emotion. ###Assistant: "
)

GOLDENS = {
    "faceframe": (
        "###Human: The audio content is as follows: <Audio><AudioHere></Audio>. "
        "Meanwhile, we uniformly sample raw frames from the video: <Video><FrameHere></Video>. "
        "Additionally, we uniformly sample raw frames from the video and extract faces from these frames: <Video><FaceHere></Video>. "
        + _TAIL
    ),
    "face": (
        "###Human: The audio content is as follows: <Audio><AudioHere></Audio>. "
        "Meanwhile, we uniformly sample raw frames from the video and extract faces from these frames: <Video><FaceHere></Video>. "
        + _TAIL
    ),
    "frame": (
        "###Human: The audio content is as follows: <Audio><AudioHere></Audio>. "
        "Meanwhile, we uniformly sample raw frames from the video: <Video><FrameHere></Video>. "
        + _TAIL
    ),
    "audioonly": (
        "###Human: The audio content is as follows: <Audio><AudioHere></Audio>. "
        + _TAIL_NOSUB
    ),
    "textonly": "###Human: " + _TAIL,
    "faceonly": (
        "###Human: We uniformly sample raw frames from the video and extract faces from these frames: <Video><FaceHere></Video>. "
        + _TAIL_NOSUB
    ),
    "frameonly": (
        "###Human: We uniformly sample raw frames from the video: <Video><FrameHere></Video>. "
        + _TAIL_NOSUB
    ),
    "image": (
        "###Human: The image content is as follows: <Image><ImageHere></Image>. "
        + _TAIL_NOSUB
    ),
    "audio_text": (
        "The audio content is as follows: <Audio><AudioHere></Audio>. " + _TAIL
    ),
    "face_text": (
        "We uniformly sample raw frames from the video and extract faces from these frames: <Video><FaceHere></Video>. "
        + _TAIL
    ),
    # reference has a lowercase "we" here (base_dataset.py:858) — parity
    # means preserving it
    "frame_text": (
        "we uniformly sample raw frames from the video: <Video><FrameHere></Video>. "
        + _TAIL
    ),
    "multiface_text": (
        "###Human: The audio and video merged info is: <Multi><MultiHere></Multi>. "
        + _TAIL
    ),
    "multiface_audio_face_text": (
        "###Human: The audio and video merged info is: <Multi><MultiHere></Multi>. "
        "The audio content is as follows: <Audio><AudioHere></Audio>. "
        "Meanwhile, we uniformly sample raw frames from the video and extract faces from these frames: <Video><FaceHere></Video>. "
        + _TAIL
    ),
    "multiframe_audio_frame_text": (
        "###Human: The audio and video merged info is: <Multi><MultiHere></Multi>. "
        "The audio content is as follows: <Audio><AudioHere></Audio>. "
        "Meanwhile, we uniformly sample raw frames from the video: <Video><FrameHere></Video>. "
        + _TAIL
    ),
    "multiface_audio_face_frame_text": (
        "###Human: The audio and video merged info is: <Multi><MultiHere></Multi>. "
        "The audio content is as follows: <Audio><AudioHere></Audio>. "
        "Meanwhile, we uniformly sample raw frames from the video and extract faces from these frames: <Video><FaceHere></Video>. "
        "Meanwhile, we uniformly sample raw frames from the video: <Video><FrameHere></Video>. "
        + _TAIL
    ),
    "multiface_audio_face_frame_au_text": (
        "###Human: The audio and video merged info is: <Multi><MultiHere></Multi>. "
        "The audio content is as follows: <Audio><AudioHere></Audio>. "
        "Meanwhile, we uniformly sample raw frames from the video and extract faces from these frames: <Video><FaceHere></Video>. "
        "Meanwhile, we uniformly sample raw frames from the video: <Video><FrameHere></Video>. "
        "The nonverbal clues (facial action units and audio emotion clues) are: <Nonverbal>AU12 lip corner puller; upbeat tone</Nonverbal>. "
        + _TAIL
    ),
    "multiface_audio_face_au_text": (
        "###Human: The audio and video merged info is: <Multi><MultiHere></Multi>. "
        "The audio content is as follows: <Audio><AudioHere></Audio>. "
        "Meanwhile, we uniformly sample raw frames from the video and extract faces from these frames: <Video><FaceHere></Video>. "
        "The nonverbal clues (facial action units and audio emotion clues) are: <Nonverbal>AU12 lip corner puller; upbeat tone</Nonverbal>. "
        + _TAIL
    ),
}


class TestPromptGoldens:
    def test_all_modes_covered(self):
        assert set(GOLDENS) == set(prompts.NEEDED_DATA)

    def test_byte_identical(self):
        for mode, expected in GOLDENS.items():
            got = prompts.get_prompt_for_multimodal(mode, SUB, MSG, nonverbal_text=NV)
            assert got == expected, f"prompt drift in mode {mode!r}:\n got: {got!r}\n exp: {expected!r}"

    def test_au_modes_without_nonverbal_drop_clause(self):
        # reference emits "" for the nonverbal clause when nonverbal_text is
        # falsy (base_dataset.py:894,905)
        for mode in ("multiface_audio_face_frame_au_text", "multiface_audio_face_au_text"):
            got = prompts.get_prompt_for_multimodal(mode, SUB, MSG, nonverbal_text=None)
            assert "<Nonverbal>" not in got
            expected = GOLDENS[mode].replace(
                "The nonverbal clues (facial action units and audio emotion clues) are: "
                "<Nonverbal>AU12 lip corner puller; upbeat tone</Nonverbal>. ",
                "",
            )
            assert got == expected

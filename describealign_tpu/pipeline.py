"""combine(): the main user-facing pipeline.

Orchestration contract follows the reference combine()
(describealign.py:1031-1175): file discovery/pairing confirmation, per-pair
decode -> features -> align -> (video retime | audio stretch) -> mux ->
plot/report, with the same prints, warnings, skip/resume rule, and defaults.

TPU specifics: PCM is zero-padded to 60-second buckets before feature
extraction so XLA compiles a handful of shapes (cached persistently) instead
of one per media length; true lengths ride alongside and mask the padding.
"""
import os

import numpy as np

from .constants import (AUDIO_EXTENSIONS, AUDIO_SAMPLE_RATE,
                        DEFAULT_ALIGNMENT_DIR, DEFAULT_OUTPUT_DIR,
                        IS_RUNNING_WINDOWS, PLOT_ALIGNMENT_TO_FILE,
                        VIDEO_EXTENSIONS)
from .utils import aligncache
from .utils.files import ensure_folders_exist, get_sorted_filenames

PCM_BUCKET_SECONDS = 60


def features_for(pcm):
    """Bucketed feature extraction utility for module users.

    Zero-pads PCM to a 60-second quantum (one compiled shape per bucket)
    and returns (feature list, true 210fps frame count) suitable for the
    feature-list align() entry.
    """
    from .ops.features import extract_features
    quantum = AUDIO_SAMPLE_RATE * PCM_BUCKET_SECONDS
    true_samples = pcm.shape[1]
    pad = (-true_samples) % quantum
    if pad:
        pcm = np.pad(pcm, ((0, 0), (0, pad)))
    feats = extract_features(pcm)
    return [np.asarray(f) for f in feats], true_samples // 210


def combine(video, audio, stretch_audio=False, yes=False, prepend="ad_",
            no_pitch_correction=False, output_dir=DEFAULT_OUTPUT_DIR,
            alignment_dir=DEFAULT_ALIGNMENT_DIR):
    """Combine videos with matching audio description files.

    Same public behavior as the reference's documented module API
    (reference README.md:136-140).
    """
    from . import __version__
    from .alignment.api import align_from_pcm
    from .media.decode import parse_audio_int16
    from .media.ffmpeg import is_ffmpeg_installed
    from .media.mux import encode_fit_as_ffmpeg_expr, write_replaced_media_to_disk
    from .media.probe import get_closest_key_frame_time
    from .report.plots import plot_alignment

    video_files, has_audio_extensions = get_sorted_filenames(
        video, VIDEO_EXTENSIONS, AUDIO_EXTENSIONS)
    if yes is False and sum(has_audio_extensions) > 0:
        print("")
        print("One or more audio files found in video input. Was this intentional?")
        print("If not, press ctrl+c to kill this script.")
        input("If this was intended, press Enter to continue...")
        print("")
    audio_desc_files, _ = get_sorted_filenames(audio, AUDIO_EXTENSIONS)
    if len(video_files) != len(audio_desc_files):
        error_msg = ["Number of valid files in input paths are not the same.",
                     f"The video path has {len(video_files)} files",
                     f"The audio path has {len(audio_desc_files)} files"]
        raise RuntimeError("\n".join(error_msg))

    print("")
    ensure_folders_exist([output_dir])
    if PLOT_ALIGNMENT_TO_FILE:
        ensure_folders_exist([alignment_dir])

    print("")
    for video_file, audio_desc_file in zip(video_files, audio_desc_files):
        print(os.path.split(video_file)[1])
        print(os.path.split(audio_desc_file)[1])
        print("")
    if yes is False:
        print("Are the above input file pairings correct?")
        print("If not, press ctrl+c to kill this script.")
        input("If they are correct, press Enter to continue...")
        print("")

    # all-WAV stretch jobs run entirely on the built-in codec; everything
    # else needs ffmpeg binaries (which, unlike the reference, we cannot
    # download in a hermetic env - static_ffmpeg is attempted if importable)
    all_wav = (all(f.lower().endswith('.wav') for f in video_files)
               and all(f.lower().endswith('.wav') for f in audio_desc_files)
               and stretch_audio)
    if not is_ffmpeg_installed() and not all_wav:
        raise RuntimeError(
            "ffmpeg/ffprobe not found. Install ffmpeg or set "
            "DESCRIBEALIGN_FFMPEG / DESCRIBEALIGN_FFPROBE.")

    print(f"Processing files with v{__version__}:")

    # decode-ahead: ffmpeg-decode the next pair in a worker thread while the
    # current pair aligns (the reference's directory loop is fully
    # sequential, describealign.py:1077)
    from concurrent.futures import ThreadPoolExecutor
    decode_pool = ThreadPoolExecutor(max_workers=1)
    num_channels = 2 if stretch_audio else 1

    def decode_pair(vf_af):
        # bucket-pad off the critical path; true lengths ride alongside
        from .alignment.api import _pad_pcm_i16
        vf, af = vf_af
        v = parse_audio_int16(vf, num_channels)
        a = parse_audio_int16(af, num_channels)
        return (_pad_pcm_i16(v), v.shape[1], _pad_pcm_i16(a), a.shape[1])

    pending = {}

    def prefetch(idx):
        if 0 <= idx < len(video_files) and idx not in pending:
            pending[idx] = decode_pool.submit(
                decode_pair, (video_files[idx], audio_desc_files[idx]))

    for pair_index, (video_file, audio_desc_file, has_audio_extension) in \
            enumerate(zip(video_files, audio_desc_files,
                          has_audio_extensions)):
        output_filename = prepend + os.path.split(video_file)[1]
        output_filename = os.path.join(output_dir, output_filename)
        print(f" {output_filename}")

        if (not stretch_audio) & bool(has_audio_extension):
            raise RuntimeError(
                "Argument --stretch_audio is required when both inputs are "
                "audio files.")

        # batch-level resume: skip pairs whose output already exists
        if (os.path.exists(output_filename)
                and os.path.getsize(output_filename) > 1e5):
            print("   output file already exists, skipping...")
            continue

        full_output_filename = os.path.abspath(output_filename)
        if IS_RUNNING_WINDOWS and len(full_output_filename) >= 260:
            print("  WARNING: very long output path, ffmpeg may fail...")

        cached = aligncache.load(alignment_dir, video_file, audio_desc_file,
                                 num_channels)
        video_arr = audio_desc_arr = None
        if cached is not None and not stretch_audio:
            print("  using cached alignment...\r", end='')
            outputs = cached
        else:
            print("  reading media files...\r", end='')
            prefetch(pair_index)
            video_i16, video_samples, audio_i16, audio_samples = \
                pending.pop(pair_index).result()
            prefetch(pair_index + 1)
            if stretch_audio:
                video_arr = (video_i16[:, :video_samples]
                             .astype(np.float16).astype(np.float32))
                audio_desc_arr = (audio_i16[:, :audio_samples]
                                  .astype(np.float16).astype(np.float32))

            if cached is not None:
                outputs = cached
            else:
                # channel count follows the mode (1 default / 2 stretch),
                # like the reference's feature extraction (combine:1096)
                outputs = align_from_pcm(video_i16, audio_i16,
                                         video_samples=video_samples,
                                         audio_samples=audio_samples)
                aligncache.save(alignment_dir, video_file, audio_desc_file,
                                outputs, num_channels)
            del video_i16, audio_i16
        audio_desc_times, video_times, similarity_percent, path, median_slope \
            = outputs

        if similarity_percent < 20:
            print(f"  WARNING: similarity {similarity_percent:.1f}%, "
                  f"likely mismatched files")
        if similarity_percent > 90:
            print(f"  WARNING: similarity {similarity_percent:.1f}%, "
                  f"likely undescribed media")
        if (median_slope < .1) or (median_slope > 10):
            print("  WARNING: median slope estimation failed, output "
                  "subtitles may be misaligned")
            median_slope = 1.

        if stretch_audio:
            from .stretch.segments import replace_aligned_segments

            def low_ram_std(arr):
                avg = np.mean(arr, dtype=np.float64)
                return np.sqrt(np.einsum('ij,ij->i', arr, arr,
                                         dtype=np.float64) / arr.size
                               - avg ** 2)

            # rescale RMS intensity of audio to match video; only ever scale
            # the louder one down to avoid overflow (reference 1141-1148)
            scale_factor = low_ram_std(video_arr) / low_ram_std(audio_desc_arr)
            for ch, ch_scale in enumerate(scale_factor):
                if ch_scale > 1:
                    video_arr[ch] /= ch_scale
                else:
                    audio_desc_arr[ch] *= ch_scale

            replace_aligned_segments(video_arr, audio_desc_arr,
                                     audio_desc_times, video_times,
                                     no_pitch_correction)
            del audio_desc_arr
            video_arr *= (2 ** 15 - 2.) / np.max(np.abs(video_arr))

            print("  processing output file...                   \r", end='')
            ffmpeg_command = write_replaced_media_to_disk(
                output_filename, video_arr,
                None if has_audio_extension else video_file,
                median_slope=median_slope)
            del video_arr
        else:
            video_offset = video_times[0] - audio_desc_times[0]
            after_start_key_frame = get_closest_key_frame_time(video_file,
                                                               video_offset)
            print("  processing output file...                   \r", end='')
            setts_cmd = encode_fit_as_ffmpeg_expr(audio_desc_times,
                                                  video_times, video_offset)
            ffmpeg_command = write_replaced_media_to_disk(
                output_filename, None, video_file, audio_desc_file, setts_cmd,
                video_offset, after_start_key_frame, median_slope=median_slope)

        if PLOT_ALIGNMENT_TO_FILE:
            plot_filename_no_ext = os.path.join(
                alignment_dir,
                os.path.splitext(os.path.split(video_file)[1])[0])
            plot_alignment(plot_filename_no_ext, path, audio_desc_times,
                           video_times, similarity_percent, median_slope,
                           stretch_audio, no_pitch_correction, ffmpeg_command)
    decode_pool.shutdown(wait=False)
    print("All files processed.       ")

"""Model zoo: SVS (VISinger), melody generators, lyric generators."""

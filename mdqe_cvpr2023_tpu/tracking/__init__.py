from .over_tracker import OverTracker, ClipResults, ctt_similarity

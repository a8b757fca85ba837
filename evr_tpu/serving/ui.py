"""Minimal built-in web UI.

The reference ships a 933-line legacy Alpine.js template that calls routes
which no longer exist (`Backend/templates/index.html:547,594` — dead UI,
SURVEY.md §2.8) alongside the real React frontend. This single-file page is
a working replacement for quick smoke use: query box, method picker,
threshold, result grid with confidence chips — all against the same
/api/search contract the React app uses.
"""

INDEX_HTML = """<!doctype html>
<html>
<head>
<meta charset="utf-8">
<title>evr_tpu — video event retrieval</title>
<style>
 body { font-family: system-ui, sans-serif; margin: 2rem auto; max-width: 960px; color: #1a1a1a; }
 h1 { font-size: 1.3rem; }
 form { display: flex; gap: .5rem; flex-wrap: wrap; margin-bottom: 1rem; }
 input[type=text] { flex: 1; min-width: 16rem; padding: .5rem; }
 select, input[type=number] { padding: .4rem; }
 button { padding: .5rem 1rem; cursor: pointer; }
 .grid { display: grid; grid-template-columns: repeat(auto-fill, minmax(180px, 1fr)); gap: .8rem; }
 .card { border: 1px solid #ddd; border-radius: 6px; padding: .5rem; font-size: .8rem; }
 .card img { width: 100%; border-radius: 4px; }
 .chips span { display: inline-block; background: #eef; border-radius: 8px; padding: 0 .45rem; margin: .1rem; font-size: .7rem; }
 #status { color: #666; margin: .6rem 0; }
</style>
</head>
<body>
<h1>evr_tpu — video event retrieval</h1>
<form id="f">
  <input type="text" id="q" placeholder="describe the event… (e.g. a person fighting on the street)">
  <select id="method">
    <option value="text_adaptive">text_adaptive</option>
    <option value="text_clip">text_clip</option>
    <option value="keyword_only">keyword_only</option>
    <option value="text_keyword">text_keyword</option>
    <option value="object_only">object_only</option>
    <option value="text_object">text_object</option>
    <option value="text_object_keyword">text_object_keyword</option>
    <option value="speech_only">speech_only</option>
    <option value="text_speech">text_speech</option>
    <option value="video">video (rank whole videos)</option>
  </select>
  <input type="number" id="thr" value="0.2" step="0.05" min="0" max="1" title="adaptive threshold">
  <input type="number" id="topk" value="12" min="1" max="50" title="top k">
  <button>Search</button>
  <input type="text" id="negq" placeholder="but not… (negative query, text_clip only)" style="min-width:12rem">
  <input type="number" id="mmr" step="0.1" min="0" max="1" placeholder="MMR λ" title="MMR diversification lambda (blank = off; text_clip/text_adaptive)" style="width:5.5rem">
</form>
<div id="status">ready</div>
<div class="grid" id="results"></div>
<script>
document.getElementById('f').addEventListener('submit', async (e) => {
  e.preventDefault();
  const status = document.getElementById('status');
  const grid = document.getElementById('results');
  status.textContent = 'searching…';
  grid.innerHTML = '';
  const body = {
    search_type: 'text',
    query: document.getElementById('q').value,
    search_method: document.getElementById('method').value,
    adaptive_threshold: parseFloat(document.getElementById('thr').value),
    top_k: parseInt(document.getElementById('topk').value),
  };
  const negq = document.getElementById('negq').value.trim();
  if (negq && body.search_method === 'text_clip') body.negative_query = negq;
  const mmr = document.getElementById('mmr').value;
  if (mmr !== '' && ['text_clip','text_adaptive'].includes(body.search_method))
    body.mmr_lambda = parseFloat(mmr);
  const t0 = performance.now();
  try {
    const resp = await fetch('/api/search', {
      method: 'POST', headers: {'Content-Type': 'application/json'},
      body: JSON.stringify(body),
    });
    const data = await resp.json();
    const events = data.events || [];
    status.textContent = `${events.length} results in ${(performance.now()-t0).toFixed(0)} ms`;
    for (const ev of events) {
      const card = document.createElement('div');
      card.className = 'card';
      card.innerHTML = `
        <img src="/api/frame/${encodeURIComponent(ev.thumbnailUrl || '')}" onerror="this.style.display='none'">
        <div><b>${ev.videoId}</b> @ ${ev.timestamp.toFixed(1)}s</div>
        <div>${ev.description}</div>
        <div class="chips">
          <span>clip ${ev.clip_similarity.toFixed(3)}</span>
          <span>text ${ev.text_confidence.toFixed(2)}</span>
          <span>obj ${ev.object_confidence.toFixed(2)}</span>
          ${ev.video_score !== undefined ? `<span>video ${ev.video_score.toFixed(3)} (${ev.matched_frames} frames)</span>` : ''}
        </div>`;
      grid.appendChild(card);
    }
  } catch (err) { status.textContent = 'error: ' + err; }
});
</script>
</body>
</html>
"""

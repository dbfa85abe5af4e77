-- round 5: coroutines run with scalar authority — the vector engine
-- must refuse (Unvectorizable -> per-element fallback), never diverge
-- and never park threads (the generator coroutine FINISHES; resume of
-- an erroring coroutine returns false + message, not a raised error).
function f(x, y)
  local gen = coroutine.wrap(function(a)
    coroutine.yield(a * 0.5 + y)
    return a - y
  end)
  local p = gen(x)
  local q = gen()
  local ok = coroutine.resume(coroutine.create(function() error("e") end))
  if ok == false then q = q + 1 end
  return p + q, x
end

-- bug class: eagerly-evaluated and/or (round-2 fix 62ad7d0) — the
-- scalar engine short-circuits `and`/`or`, so a vector evaluation that
-- computes both sides eagerly must either match bit-exactly or refuse
-- (Unvectorizable), never silently diverge through the un-taken side.
function f(x, y)
  if (x > 0) and (math.sqrt(x) > 0.5) then
    return x, y
  end
  if (y > 1.5) or (math.log(y + 3) < 0.1) then
    return y * 2, x
  end
  return nil
end
